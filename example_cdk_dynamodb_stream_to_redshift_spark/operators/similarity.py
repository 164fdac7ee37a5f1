"""Similarity search over embedding columns (array<float>).

Two paths, per the standard scale recipe:
- brute-force cosine top-k: exact baseline. One narrow projection + top-k;
  at cluster scale this is a full scan but zero shuffle (TakeOrderedAndProject
  does per-partition top-k then merges k*partitions rows on the driver).
- LSH-bucketed (random hyperplane / SRP): probe only the query's bucket(s) —
  the 100 TB path. Signatures are precomputed once; the probe is a bucket
  equi-join.

Cosine has two formulations:
- ``cosine`` — plain double math (production hot path, stays in codegen).
- ``cosine_q6`` — inputs quantized to 1e-6 integers, dot/norms in exact int64
  arithmetic, one final double division. Bit-identical across engines —
  used by the DuckDB-oracle-checked queries (see tests: float folds differ
  in the last ulp between engines; integer math doesn't).
"""

from __future__ import annotations

import math
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Vector = "list[float]"


def srp_hamming_budget(threshold: float, n_planes: int, sigmas: float = 4.5) -> int:
    """Hamming budget for SRP candidate filtering, from the binomial tail —
    data-independent, no peeking at the corpus.

    A pair at exactly ``cos = threshold`` disagrees on each plane with
    p = acos(threshold)/pi, so its Hamming distance over ``n_planes`` is
    Binomial(n_planes, p). Budget = mean + ``sigmas``·sd caps the per-pair
    false-negative probability at ~Phi(-sigmas) (3.4e-6 at 4.5σ) for the
    worst pair AT the threshold; pairs above it are strictly safer. Misses
    concentrate exactly at the threshold boundary where 'near-dup' is
    already a judgment call — raise ``sigmas`` to push ε down further at
    the cost of a weaker prune."""
    p = math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    mu = n_planes * p
    sd = math.sqrt(n_planes * p * (1.0 - p))
    return min(n_planes, int(math.ceil(mu + sigmas * sd)))


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dlit(x: float) -> str:
    """Exact double-literal SQL text. ``repr`` emits the shortest decimal
    that round-trips the double, and Spark's literal parser is correctly
    rounded, so the parsed value is BIT-IDENTICAL to ``F.lit(x)``
    (asserted in tests/test_pq_ann.py). Non-finite values need the cast
    spelling — ``repr`` would emit ``infD``/``nanD``, which the parser
    rejects, and a degenerate codebook/plane (e.g. trained on zero-norm
    inputs) must fail at scoring like the old ``F.lit`` path did, not at
    expression parse."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(x) + "D"


def double_array_lit(values) -> Column:
    """``array<double>`` literal built with ONE expression-parse call.

    ``F.array(*[F.lit(x) ...])`` / ``F.lit([...])`` pay a py4j
    round-trip per element — ~0.6s of pure DRIVER time for a 1k-float
    codebook, per call, which dominated ANN plan construction (the
    measured bulk of pq/ivfpq "build" cost at bench SF). Parsing one SQL
    string is O(ms) and yields the bitwise-identical literal."""
    body = ",".join(_dlit(v) for v in values)
    if not body:  # bare array() parses as array<void> — pin the type
        return F.expr("CAST(array() AS array<double>)")
    return F.expr(f"array({body})")


def long_array_lit(values) -> Column:
    """``array<bigint>`` literal via one expression-parse call."""
    body = ",".join(f"{int(v)}L" for v in values)
    if not body:
        return F.expr("CAST(array() AS array<bigint>)")
    return F.expr(f"array({body})")


def long_matrix_lit(rows) -> Column:
    """``array<array<bigint>>`` literal via one expression-parse call."""
    body = ",".join(
        "array(" + ",".join(f"{int(v)}L" for v in r) + ")" for r in rows
    )
    if not body or not all(len(r) for r in rows):
        return F.expr(
            "CAST(array(" + body + ") AS array<array<bigint>>)"
        )
    return F.expr(f"array({body})")


def double_matrix_lit(rows) -> Column:
    """``array<array<double>>`` literal via one expression-parse call —
    see ``double_array_lit`` for why not ``F.lit(nested_list)``."""
    body = ",".join(
        "array(" + ",".join(_dlit(v) for v in r) + ")" for r in rows
    )
    if not body or not all(len(r) for r in rows):
        return F.expr(
            "CAST(array(" + body + ") AS array<array<double>>)"
        )
    return F.expr(f"array({body})")


def _q6(col: Column) -> Column:
    """Quantize each component to round(x * 1e6) as int64."""
    return F.transform(col, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))


def _fold_sum(arr: Column, zero) -> Column:
    return F.aggregate(arr, zero, lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y), F.lit(0.0))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Plain double cosine — the production path."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_q6(a: Column, b: Column) -> Column:
    """Quantized cosine — bit-stable across engines (oracle path)."""
    qa, qb = _q6(a), _q6(b)
    d = _fold_sum(F.zip_with(qa, qb, lambda x, y: x * y), F.lit(0).cast("long"))
    na = _fold_sum(F.transform(qa, lambda x: x * x), F.lit(0).cast("long"))
    nb = _fold_sum(F.transform(qb, lambda x: x * x), F.lit(0).cast("long"))
    return d.cast("double") / (
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )


def brute_force_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Exact cosine top-k of ``emb`` rows vs the single-row ``query``
    DataFrame (column ``q``). Output: id, cos_sim — k rows, ties broken by id.

    The query row is broadcast; the scan never shuffles. ``orderBy + limit``
    compiles to TakeOrderedAndProject (per-partition heaps, driver merge of
    k*partitions rows) — the right plan at any scale.
    """
    sim = cosine_q6 if exact_engine_parity else cosine
    return (
        emb.crossJoin(F.broadcast(query))
        .select(
            F.col(id_col),
            sim(F.col(vec_col), F.col("q")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (signed random projections) — the ANN scale path.
# ---------------------------------------------------------------------------
def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; no numpy dependency at
    plan-build time, reproducible across runs)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append(state / float(1 << 31) - 0.5)
        planes.append(row)
    return planes


def srp_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Bit-signature: bit_i = 1 if dot(vec, plane_i) >= 0 — packed into a
    bigint bucket key. Cosine-similar vectors collide with high probability."""
    planes = _hyperplanes(dim, n_planes, seed)
    dv = _dbl(vec)
    bits = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = double_array_lit(plane)
        d = _fold_sum(F.zip_with(dv, p, lambda x, y: x * y), F.lit(0.0))
        # shiftleft, not a lit: 1 << 63 overflows a signed long literal
        bits = bits + F.when(
            d >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bits


def srp_signature_words(vec: Column, dim: int, n_planes: int, seed: int = 42) -> Column:
    """Wide SRP signature packed into array<long> words (word w holds planes
    [64w, 64w+64)). Used by the Hamming prefilter, where more planes =
    tighter binomial concentration = a smaller σ-margin on the budget
    (see srp_hamming_budget).

    Implemented as an Arrow-batched pandas_udf: the signature is one
    (batch × dim) @ (dim × n_planes) matrix product, which numpy does in a
    single BLAS call per batch. The expression-tree formulation (n_planes
    separate zip_with folds) re-evaluates the cast array per fold with no
    CSE — measured ~25× slower at 256 planes, the same pitfall that hit
    minhash. Signatures only ever compare against signatures from the same
    function, so no cross-engine bit parity is required of them (the
    borderline d≈0 sign may differ from a sequential fold — irrelevant to
    the Hamming-distribution guarantees)."""
    from pyspark.sql.functions import pandas_udf

    planes_t = np.array(_hyperplanes(dim, n_planes, seed)).T  # dim × n_planes
    n_words = -(-n_planes // 64)
    weights = 1 << np.arange(64, dtype=np.uint64)

    @pandas_udf("array<long>")
    def sig(col: pd.Series) -> pd.Series:
        mat = np.asarray(col.tolist(), dtype=np.float64)  # batch × dim
        bits = (mat @ planes_t) >= 0.0  # batch × n_planes
        words = np.zeros((len(mat), n_words), dtype=np.uint64)
        for w in range(n_words):
            blk = bits[:, w * 64 : (w + 1) * 64]
            words[:, w] = blk.astype(np.uint64) @ weights[: blk.shape[1]]
        out = words.view(np.int64)  # reinterpret: bit 63 wraps, no overflow
        return pd.Series(list(out))

    return sig(vec)


def hamming_words(a: Column, b: Column, n_words: int | None = None) -> Column:
    """Hamming distance between two packed array<long> signatures.

    Pass ``n_words`` when known: the statically-unrolled bit_count sum
    stays inside whole-stage codegen, while the higher-order aggregate
    fallback is interpreted per row — measured ~4× slower on a 4-word
    filter over 2M pairs."""
    if n_words is not None:
        out = None
        for w in range(1, n_words + 1):
            t = F.bit_count(F.element_at(a, w).bitwiseXOR(F.element_at(b, w)))
            out = t if out is None else out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def build_srp_index(
    emb: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Precompute (id, vec, bucket). At scale: write this partitioned/bucketed
    by ``bucket`` so probes are partition-pruned scans."""
    return emb.select(
        F.col(id_col),
        F.col(vec_col),
        srp_signature(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )


def srp_topk(
    index: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 16,
    seed: int = 42,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Approximate top-k via mask-enumerated multi-probe: the query's bucket
    is expanded driver-side into every bucket within ``max_hamming`` bits
    (sum of C(n_planes, 0..h) probe masks), and candidates come from a
    broadcast EQUI-join of the index against that probe set — not a
    bit_count filter over the whole scan. With the index written
    partitioned/bucketed by ``bucket``, the equi-join key feeds partition
    pruning / dynamic pruning, so a probe touches only the matching
    fraction of the corpus on disk; a non-equi `bit_count(xor) <= h`
    predicate can never prune storage.

    The single query row is collected to the driver (it is one vector by
    definition, same contract as ivf_topk's query_vec) to enumerate masks.

    ``max_hamming == n_planes`` probes every bucket — recall 1.0 by
    construction (the degenerate exact configuration, equal to brute
    force); ``exact_engine_parity`` switches the verify cosine to the
    quantized bit-stable form so that configuration can be hash-checked
    against the brute-force oracle.
    """
    qrow = query.select(
        F.col("q"), srp_signature(F.col("q"), dim, n_planes, seed).alias("qbucket")
    ).first()
    qbucket = qrow["qbucket"]
    masks = [0] + [
        sum(1 << b for b in bits)
        for r in range(1, max_hamming + 1)
        for bits in combinations(range(n_planes), r)
    ]
    probes = index.sparkSession.createDataFrame(
        [(qbucket ^ m,) for m in masks], "bucket long"
    )
    qcol = double_array_lit(qrow["q"])
    sim = cosine_q6 if exact_engine_parity else cosine
    return (
        index.join(F.broadcast(probes), "bucket")
        .select(F.col(id_col), sim(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer + probed lists.
# ---------------------------------------------------------------------------
def _l2sq(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(_dbl(a), b, lambda x, y: (x - y) * (x - y)), F.lit(0.0)
    )


def _assign_cid(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id (squared L2, deterministic min-cid tie-break).
    array_min over struct<dist,cid> compares lexicographically — a single
    expression, no shuffle, no UDF. The centroid matrix enters the plan as
    ONE nested-array literal probed by a transform lambda (not K inlined
    per-centroid distance trees): the expression tree stays O(1) operator
    nodes regardless of K, which keeps Catalyst analysis flat as K grows
    (at K=64 the per-centroid form spent tens of seconds in the analyzer)."""
    cl = double_matrix_lit(centroids)
    cands = F.transform(
        cl,
        lambda c, i: F.struct(
            _l2sq(vec, c).alias("dist"), i.alias("cid")
        ),
    )
    return F.array_min(cands)["cid"]


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means for the IVF coarse quantizer.

    Deterministic init (first ``n_centroids`` vectors by id). Each
    iteration is ONE distributed pass: an Arrow-batched kernel assigns
    every row to its nearest centroid (vectorized BLAS distance matrix
    against the broadcast K x dim codebook) and emits per-PARTITION
    (cid, count, component-sum) partials — at most K rows per partition,
    so the collect is the bounded O(partitions*K*dim) artifact class and
    the means reduce on the driver with no shuffle at all. Only the
    K x dim centroid matrix ever reaches the driver, so this trains
    unchanged on a 100 TB corpus. (The previous per-iteration codegen
    assignment + posexplode per-component aggregation spent ~3s/iter in
    plan compilation alone on a 2k-row corpus — the kernel's plan is
    iteration-invariant, only the broadcast changes.)

    Ties break to the lowest cid (argmin first-index), matching the
    ``_assign_cid`` serving expression; assignment distances use the
    expanded ||x||^2 - 2x.c + ||c||^2 form (BLAS matmul), which can
    differ from the serving path by ulps on near-ties — immaterial to a
    lossy trained quantizer, and every exactness-bearing config
    (fullprobe / lossless codes) is independent of centroid values by
    construction.
    """
    import numpy as np  # noqa: F811
    import pandas as pd  # noqa: F401

    centroids = [
        [float(x) for x in r["_v"]]
        for r in emb.orderBy(id_col)
        .limit(n_centroids)
        .select(_dbl(F.col(vec_col)).alias("_v"))
        .collect()
    ]
    if not iters:
        return centroids
    sc = emb.sparkSession.sparkContext
    vecs = emb.select(_dbl(F.col(vec_col)).alias("_v"))
    for _ in range(iters):
        bc = sc.broadcast(np.asarray(centroids, dtype=np.float64))

        def part_stats(batches):
            # self-contained: executors don't share driver sys.path
            import numpy as np
            import pandas as pd

            cmat = bc.value
            k, d = cmat.shape
            counts = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, d), dtype=np.float64)
            cn = (cmat * cmat).sum(axis=1)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
                d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ cmat.T) + cn[None, :]
                cid = d2.argmin(axis=1)
                for c in np.unique(cid):
                    mask = cid == c
                    counts[c] += int(mask.sum())
                    sums[c] += x[mask].sum(axis=0)
            nz = counts.nonzero()[0]
            if len(nz):
                yield pd.DataFrame(
                    {
                        "cid": nz.astype("int32"),
                        "n": counts[nz],
                        "sums": [sums[c].tolist() for c in nz],
                    }
                )

        partials = vecs.mapInPandas(
            part_stats, "cid int, n long, sums array<double>"
        ).collect()
        k, d = len(centroids), len(centroids[0])
        agg_n = np.zeros(k, dtype=np.int64)
        agg_s = np.zeros((k, d), dtype=np.float64)
        for r in partials:
            agg_n[r["cid"]] += r["n"]
            agg_s[r["cid"]] += np.asarray(r["sums"], dtype=np.float64)
        centroids = [
            (agg_s[c] / agg_n[c]).tolist() if agg_n[c] else centroids[c]
            for c in range(k)
        ]
    return centroids


def build_ivf_index(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cid) inverted lists. At scale: persist partitioned by
    ``cid`` so a probe reads only nprobe/K of the corpus from disk."""
    return emb.select(
        F.col(id_col),
        F.col(vec_col),
        _assign_cid(F.col(vec_col), centroids).alias("cid"),
    )


def write_ivf_index(index: DataFrame, path: str) -> None:
    """Persist the inverted lists PARTITIONED BY cid — the layout that makes
    ``ivf_topk``'s ``cid IN (probe set)`` filter a storage-level partition
    prune: a probe job lists and reads only nprobe of the K directories
    (asserted against ``inputFiles()`` in tests/test_ivf_ann.py). At 100 TB
    this is the difference between scanning nprobe/K of the corpus and all
    of it."""
    index.write.mode("overwrite").partitionBy("cid").parquet(path)


def append_ivf_index(
    new_emb: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign ONLY the new batch with the
    FROZEN coarse quantizer and append its rows into the existing
    cid-partitioned store — the historical lists are never re-read or
    re-clustered (the ANN twin of the corpus-side incremental MinHash
    index). Per-batch cost is O(|batch|); probes over the grown index are
    plan-identical (same partition prune). Centroid drift is handled the
    way IVF systems do at scale: retrain + rebuild on a cadence, not per
    batch — equivalence to a full rebuild under the same centroids is
    asserted in tests/test_ivf_ann.py."""
    build_ivf_index(new_emb, centroids, id_col, vec_col).write.mode(
        "append"
    ).partitionBy("cid").parquet(path)


def read_ivf_index(spark, path: str) -> DataFrame:
    """Read inverted lists written by write_ivf_index; ``cid`` comes back as
    the partition column."""
    return spark.read.parquet(path)


def ivf_topk(
    index: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Probe the ``nprobe`` nearest inverted lists, exact cosine inside them.

    ``nprobe == len(centroids)`` degrades to exact brute force (asserted in
    tests AND hash-checked against the brute-force DuckDB oracle via the
    driver's ivf_ann_fullprobe_topk entry), giving a turnable recall/cost
    dial. ``exact_engine_parity`` selects the quantized bit-stable cosine
    for that oracle path. The query vector is a plain driver-side list (it
    is one vector by definition); probe selection is O(K) on the driver,
    the scan itself is the pruned distributed job.
    """
    dists = [
        (sum((x - c[i]) ** 2 for i, x in enumerate(query_vec)), cid)
        for cid, c in enumerate(centroids)
    ]
    probe_cids = [cid for _, cid in sorted(dists)[:nprobe]]
    qcol = double_array_lit(query_vec)
    sim = cosine_q6 if exact_engine_parity else cosine
    return (
        index.filter(F.col("cid").isin(probe_cids))
        .select(F.col(id_col), sim(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def srp_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 64,
    seed: int = 42,
    max_hamming: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Bucket-FIRST embedding near-dup: pigeonhole block equi-joins generate
    candidates, exact cosine verifies candidates only. The true-dup
    (high-threshold) scale path.

    Plan: the ``n_planes``-bit signature is split into ``max_hamming + 1``
    contiguous blocks; two signatures within Hamming ``max_hamming`` MUST
    agree exactly on at least one block (pigeonhole), so candidates come
    from a self EQUI-join on (block_idx, block_value) — shuffle-keyed,
    never a BroadcastNestedLoop/theta join. A cheap whole-signature Hamming
    cut runs inside the join residual; surviving distinct pairs fetch
    vectors and get the exact cosine check.

    Selectivity is threshold-driven: at true-dup thresholds (cos >= 0.95,
    max_hamming ~2-4 of 64) a block carries 64/(h+1) >= 12 bits, so a
    random pair matches a block with p <= 2^-12 and the candidate set is a
    vanishing fraction of n². At LOOSE thresholds the required budget (see
    srp_hamming_budget) forces narrow blocks and the pigeonhole admits
    ~everything — use embedding_near_dup_pairs, whose chunked scan +
    Hamming prefilter is the honest plan there. Recall: misses require ALL
    h+1 blocks to differ, bounded by P(Hamming > max_hamming) — the
    binomial tail of srp_hamming_budget.
    """
    if n_planes > 64:
        raise ValueError("block path packs the signature in one long: n_planes <= 64")
    if max_hamming is None:
        max_hamming = srp_hamming_budget(threshold, n_planes)
    n_blocks = max_hamming + 1
    bounds = [round(i * n_planes / n_blocks) for i in range(n_blocks + 1)]
    sig = F.element_at(srp_signature_words(F.col(vec_col), dim, n_planes, seed), 1)
    idx = emb.select(F.col(id_col).alias("id"), sig.alias("sig"))
    block_structs = [
        F.struct(
            F.lit(i).alias("blk"),
            F.shiftrightunsigned(F.col("sig"), bounds[i])
            .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
            .alias("val"),
        )
        for i in range(n_blocks)
    ]
    # the block index — (id, sig, blk, val), |V|·(h+1) rows — is THE LSH
    # index artifact; checkpoint it so the self-join's two sides read one
    # materialization instead of each re-running the signature kernel
    # over the corpus (Spark does no cross-subtree CSE). At scale this is
    # the table you'd persist bucketed by (blk, val), exactly like the
    # MinHash band index.
    from .lineage import truncate_lineage

    blocked = truncate_lineage(
        idx.select(
            "id", "sig", F.explode(F.array(*block_structs)).alias("bk")
        ).select("id", "sig", "bk.blk", "bk.val")
    )
    a = blocked.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "blk", "val"
    )
    b = blocked.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "blk", "val"
    )
    cands = (
        a.join(
            b,
            ["blk", "val"],
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                <= max_hamming
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sides = _pair_sides(emb, id_col, vec_col, exact_engine_parity)
    verified = cands.join(sides("a"), "id_a").join(sides("b"), "id_b")
    return verified.select(
        "id_a", "id_b", _pair_cos(exact_engine_parity)
    ).filter(F.col("cos_sim") >= F.lit(threshold))


def _pair_sides(emb, id_col, vec_col, exact_engine_parity, sig: Column | None = None):
    """Per-side projection for pair joins with per-vector work HOISTED:
    quantization, norm (and the optional prefilter signature) are evaluated
    |V| times, never |V|² (inside the join each pair would re-quantize both
    64-dim arrays; measured ~20× slower)."""
    if exact_engine_parity:
        qcol = _q6(F.col(vec_col))
        zero = F.lit(0).cast("long")
    else:
        qcol = _dbl(F.col(vec_col))
        zero = F.lit(0.0)
    sq_norm = _fold_sum(F.transform(qcol, lambda x: x * x), zero)

    def side(suffix: str) -> DataFrame:
        extra = [sig.alias(f"_sig_{suffix}")] if sig is not None else []
        return emb.select(
            F.col(id_col).alias(f"id_{suffix}"),
            qcol.alias(f"q{suffix}"),
            F.sqrt(sq_norm.cast("double")).alias(f"n{suffix}"),
            *extra,
        )

    return side


def _pair_cos(exact_engine_parity: bool) -> Column:
    """cos over hoisted pair sides; reproduces the oracle's
    ``dot / (sqrt(na)·sqrt(nb))`` IEEE op order exactly."""
    zero = F.lit(0).cast("long") if exact_engine_parity else F.lit(0.0)
    dot_pair = _fold_sum(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y), zero
    )
    return (dot_pair.cast("double") / (F.col("na") * F.col("nb"))).alias("cos_sim")


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_engine_parity: bool = False,
    dim: int | None = None,
    prefilter_planes: int = 0,
    n_chunks: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold),
    exact, as a distributed CHUNKED pair scan with an optional SRP Hamming
    prefilter — the honest plan for loose thresholds.

    Why not bucket-first here: on zero-mean corpora a loose threshold (e.g.
    0.4) sits in the bulk of the cosine distribution, and the Hamming
    budget guaranteeing recall (srp_hamming_budget) admits a large constant
    fraction of random pairs — measured on the driver corpus: ≥46% of all
    pairs at 64 planes, and a pigeonhole block join's candidate volume
    EXCEEDS the pair count. No LSH layout beats a scan there; what scale
    needs instead is (a) pair generation that is not a broadcast
    nested-loop — here a shuffle EQUI-join on a chunk key: the right side
    hashes into ``n_chunks`` buckets, the left replicates once per bucket
    (sequence+explode), so tasks split the n²/2 work evenly with bounded
    memory and no full-side broadcast — and (b) cheap rejection before the
    O(dim) dot: with ``prefilter_planes`` > 0 (multiples of 64), a packed
    SRP signature cuts pairs whose Hamming exceeds the binomial budget
    (at 256 planes / cos 0.4: ~83% of dot products skipped for a <4e-6
    per-pair miss bound at the threshold itself). ``prefilter_planes=0``
    keeps the operator exactly-exact: bit-for-bit the all-pairs result.

    At TRUE-dup thresholds use srp_near_dup_pairs: its block equi-join
    prunes the pair space itself, not just the per-pair arithmetic.
    """
    sig = None
    budget = 0
    if prefilter_planes:
        if dim is None:
            raise ValueError("dim is required when prefilter_planes > 0")
        budget = srp_hamming_budget(threshold, prefilter_planes)
        sig = srp_signature_words(F.col(vec_col), dim, prefilter_planes, seed)
    sides = _pair_sides(emb, id_col, vec_col, exact_engine_parity, sig=sig)
    a = sides("a").withColumn(
        "_cb", F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1)))
    )
    b = sides("b").withColumn(
        "_cb", F.pmod(F.xxhash64(F.col("id_b")), F.lit(n_chunks)).cast("int")
    )
    pairs = a.join(b, "_cb").filter(F.col("id_a") < F.col("id_b"))
    if prefilter_planes:
        pairs = pairs.filter(
            hamming_words(
                F.col("_sig_a"), F.col("_sig_b"), -(-prefilter_planes // 64)
            )
            <= F.lit(budget)
        )
    return pairs.select("id_a", "id_b", _pair_cos(exact_engine_parity)).filter(
        F.col("cos_sim") >= F.lit(threshold)
    )


# ---------------------------------------------------------------------------
# Batch exact k-NN join: every query row gets its top-k corpus neighbors.
# ---------------------------------------------------------------------------
def _np_q6(x):
    """numpy replica of the q6 quantizer (F.round(x*1e6) cast long):
    HALF_UP = round half AWAY from zero — np.round would banker's-round
    ties to even and diverge from Spark/DuckDB on exact .5 products."""
    scaled = x * 1_000_000.0
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)


def knn_join(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q",
    exact_engine_parity: bool = False,
    q_chunk_rows: int | None = None,
) -> DataFrame:
    """EXACT cosine k-NN of every ``queries`` row against ``emb`` — the
    batch-serving / SemDeDup-curation primitive (one query at a time is
    ``brute_force_topk``; this amortizes ONE corpus scan over all Q
    queries). Output: (q_id, <id_col>, cos_sim), k rows per query, ties
    broken by ascending id.

    Plan: the Q×dim query matrix is collected (bounded, O(Q·dim) — the
    same artifact class as IVF centroids/PQ codebooks) and broadcast;
    each corpus partition computes its scores as one (rows × dim) @
    (dim × Q) BLAS matmul inside Arrow batches and emits only its LOCAL
    top-k per query, so the single shuffle carries ≤ partitions·Q·k
    candidate rows — never corpus rows — into the final per-query
    window. Corpus never shuffles.

    ``q_chunk_rows`` bounds the driver/broadcast footprint IN CODE
    rather than by caller discipline: a query set larger than the bound
    is split into ⌈Q/chunk⌉ independent broadcast+scan passes whose
    results are unioned — per-query results are independent, so chunked
    output is row-identical to unchunked (pinned by
    tests/test_knn_join.py). Each chunk pays one corpus scan: at 100 TB
    pick the largest chunk that fits executor memory
    (~chunk × dim × 8 bytes broadcast + rows_per_batch × chunk × 8
    scores) so the scan count stays minimal.

    ``exact_engine_parity`` scores with the int64 q6-quantized cosine
    (exact integer dot products, HALF_UP rounding identical to
    Spark/DuckDB ``round``) so results hash-match a SQL oracle
    bit-for-bit; the default float path is the production kernel.
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("q_id", queries.schema[q_id_col].dataType),
            T.StructField(id_col, emb.schema[id_col].dataType),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )
    q_rows = queries.select(q_id_col, q_vec_col).collect()
    if not q_rows:
        return emb.sparkSession.createDataFrame([], out_schema)
    if q_chunk_rows is not None and q_chunk_rows < len(q_rows):
        out = None
        for i in range(0, len(q_rows), q_chunk_rows):
            part = _knn_join_chunk(
                emb,
                q_rows[i : i + q_chunk_rows],
                out_schema,
                k,
                id_col,
                vec_col,
                q_id_col,
                q_vec_col,
                exact_engine_parity,
            )
            out = part if out is None else out.unionByName(part)
        return out
    return _knn_join_chunk(
        emb,
        q_rows,
        out_schema,
        k,
        id_col,
        vec_col,
        q_id_col,
        q_vec_col,
        exact_engine_parity,
    )


def _knn_join_chunk(
    emb: DataFrame,
    q_rows: list,
    out_schema,
    k: int,
    id_col: str,
    vec_col: str,
    q_id_col: str,
    q_vec_col: str,
    exact_engine_parity: bool,
) -> DataFrame:
    """One broadcast+scan pass of ``knn_join`` over a bounded query list."""
    import pandas as pd  # noqa: F811

    q_ids = [r[q_id_col] for r in q_rows]
    q_mat = np.asarray([list(r[q_vec_col]) for r in q_rows], dtype=np.float64)
    sc = emb.sparkSession.sparkContext
    if exact_engine_parity:
        qq = _np_q6(q_mat)
        bc = sc.broadcast((qq, np.sqrt((qq * qq).sum(axis=1).astype(np.float64))))
    else:
        # raw matrix + norms, NOT pre-normalized rows: cosine is computed
        # as dot/(|x|*|q|) — the same op sequence as a scalar reference —
        # so EXACT ties (e.g. integer-valued vectors) stay bit-equal and
        # the ascending-id tie-break is deterministic. Normalize-first
        # rounds per component before the dot and can split a true tie
        # by an ulp, flipping which id wins.
        bc = sc.broadcast((q_mat, np.sqrt((q_mat * q_mat).sum(axis=1))))
    nq = len(q_ids)

    def part_topk(batches):
        # accumulate per-batch candidates; one top-k cut per PARTITION at
        # the end, so emitted rows stay <= Q*k regardless of batch count.
        # Self-contained (the q6 replica is a local def, not a module
        # reference): Python workers don't share the driver's sys.path,
        # so a by-reference pickle of package helpers would fail to
        # import on executors launched outside the repo root.
        def np_q6(x):
            scaled = x * 1_000_000.0
            return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)

        cand_ids: list[np.ndarray] = []
        cand_sims: list[np.ndarray] = []
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            if exact_engine_parity:
                qq, qn = bc.value
                qm = np_q6(mat)
                dots = (qm @ qq.T).astype(np.float64)  # exact int64 dots
                norms = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
                sims = dots / (norms[:, None] * qn[None, :])
            else:
                qm, qn = bc.value
                dots = mat @ qm.T  # rows × Q
                norms = np.sqrt((mat * mat).sum(axis=1))
                sims = dots / (norms[:, None] * qn[None, :])
            top = min(k, sims.shape[0])
            # per-query partial top-k with the FINAL tie rule (sim desc,
            # id asc): lexsort is ascending -> sort by (-sim, id)
            for qi in range(nq):
                order = np.lexsort((ids, -sims[:, qi]))[:top]
                cand_ids.append(ids[order])
                cand_sims.append(sims[order, qi])
        if not cand_ids:
            return
        per_q_ids, per_q_sims, per_q_qi = [], [], []
        n_batches = len(cand_ids) // nq
        for qi in range(nq):
            ids_q = np.concatenate(cand_ids[qi::nq]) if n_batches > 1 else cand_ids[qi]
            sims_q = np.concatenate(cand_sims[qi::nq]) if n_batches > 1 else cand_sims[qi]
            order = np.lexsort((ids_q, -sims_q))[:k]
            per_q_ids.append(ids_q[order])
            per_q_sims.append(sims_q[order])
            per_q_qi.append(np.full(len(order), qi))
        qi_all = np.concatenate(per_q_qi)
        yield pd.DataFrame(
            {
                "q_id": [q_ids[i] for i in qi_all],
                id_col: np.concatenate(per_q_ids),
                "cos_sim": np.concatenate(per_q_sims),
            }
        )

    partials = emb.select(id_col, vec_col).mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        partials.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ivf_knn_join(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Batch k-NN through IVF list pruning — ``knn_join``'s 100 TB serving
    path: each query probes only its ``nprobe`` nearest inverted lists, so
    the scan reads ~nprobe/K of the corpus (a storage-level partition
    prune when the index is persisted via ``write_ivf_index``).

    Plan, fully JVM-side (no Python kernel): probe-cid selection is O(Q·K)
    on the driver (the same bounded artifact class as the centroids); the
    (q_id, cid, qvec) probe table BROADCASTS into an equi-join on cid
    against the index — never a cross join — scoring rides the join output
    as a codegen cosine expression, and the per-query window ranks only
    the pruned candidate rows. ``nprobe == len(centroids)`` degrades to
    the exact brute-force k-NN join (driver-proven against the same
    oracle as knn_join); recall at partial probe is the standard IVF
    trade, tested in tests/test_ivf_ann.py.
    """
    from pyspark.sql import types as T

    q_rows = queries.select(q_id_col, q_vec_col).collect()
    probe_rows = []
    for r in q_rows:
        qv = [float(x) for x in r[q_vec_col]]
        dists = sorted(
            (sum((x - c[i]) ** 2 for i, x in enumerate(qv)), cid)
            for cid, c in enumerate(centroids)
        )
        for _, cid in dists[:nprobe]:
            probe_rows.append((r[q_id_col], cid, qv))
    probes = index.sparkSession.createDataFrame(
        probe_rows,
        T.StructType(
            [
                T.StructField("q_id", queries.schema[q_id_col].dataType),
                T.StructField("cid", T.IntegerType()),
                T.StructField("q", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    sim = cosine_q6 if exact_engine_parity else cosine
    scored = index.join(F.broadcast(probes), "cid").select(
        "q_id", F.col(id_col), sim(F.col(vec_col), F.col("q")).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
