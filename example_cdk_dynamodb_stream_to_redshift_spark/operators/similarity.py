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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Vector = "list[float]"


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


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
        p = F.array(*[F.lit(x) for x in plane])
        d = _fold_sum(F.zip_with(dv, p, lambda x, y: x * y), F.lit(0.0))
        bits = bits + F.when(d >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return bits


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
) -> DataFrame:
    """Approximate top-k: score only rows whose bucket is within
    ``max_hamming`` bits of the query's bucket (multi-probe SRP-LSH).

    The candidate filter is `bit_count(bucket XOR qbucket) <= h` — evaluated
    against the precomputed index; with a bucket-partitioned index this
    prunes to a tiny fraction of the corpus before any cosine is computed.
    """
    q = query.select(
        F.col("q"), srp_signature(F.col("q"), dim, n_planes, seed).alias("qbucket")
    )
    cand = index.crossJoin(F.broadcast(q)).filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.col("qbucket"))) <= max_hamming
    )
    return (
        cand.select(
            F.col(id_col), cosine(F.col(vec_col), F.col("q")).alias("cos_sim")
        )
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


def _centroid_lit(c: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in c])


def _assign_cid(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id (squared L2, deterministic min-cid tie-break).
    array_min over struct<dist,cid> compares lexicographically — a single
    codegen expression, no shuffle, no UDF."""
    cells = [
        F.struct(
            _l2sq(vec, _centroid_lit(c)).alias("dist"),
            F.lit(i).alias("cid"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_min(F.array(*cells))["cid"]


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means for the IVF coarse quantizer, as DataFrame jobs.

    Deterministic init (first ``n_centroids`` vectors by id). Each iteration
    is one distributed pass: assign (codegen expression) -> posexplode ->
    per-(cid, dim) mean. Only the K x dim centroid matrix (tiny) ever
    reaches the driver, so this trains unchanged on a 100 TB corpus.
    """
    centroids = [
        [float(x) for x in r["_v"]]
        for r in emb.orderBy(id_col)
        .limit(n_centroids)
        .select(_dbl(F.col(vec_col)).alias("_v"))
        .collect()
    ]
    for _ in range(iters):
        assigned = emb.select(
            _assign_cid(F.col(vec_col), centroids).alias("cid"),
            _dbl(F.col(vec_col)).alias("_v"),
        )
        rows = (
            assigned.select("cid", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {}
        for r in rows:
            new.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        centroids = [
            [new[i][p] for p in range(len(centroids[i]))] if i in new else centroids[i]
            for i in range(len(centroids))
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


def ivf_topk(
    index: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest inverted lists, exact cosine inside them.

    ``nprobe == len(centroids)`` degrades to exact brute force (asserted in
    tests), giving a turnable recall/cost dial. The query vector is a plain
    driver-side list (it is one vector by definition); probe selection is
    O(K) on the driver, the scan itself is the pruned distributed job.
    """
    dists = [
        (sum((x - c[i]) ** 2 for i, x in enumerate(query_vec)), cid)
        for cid, c in enumerate(centroids)
    ]
    probe_cids = [cid for _, cid in sorted(dists)[:nprobe]]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        index.filter(F.col("cid").isin(probe_cids))
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def srp_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via SRP-LSH pre-bucketing: only pairs whose
    bit signatures are within ``max_hamming`` get an exact cosine check.

    Plan: signatures once (narrow projection), self-join on signature with
    the Hamming filter in the join condition — at scale, replace the
    signature theta-join with multi-probe bucket equi-joins (enumerate the
    ≤ C(n_planes, max_hamming) masks) so the join key is exact; here the
    corpus side fits broadcast. Recall vs the exact all-pairs form is
    probabilistic: P(one plane disagrees) = acos(cos_sim)/pi, so size
    ``max_hamming`` to the target threshold (~2 for cos>=0.95 true dups,
    ~7/16 planes for a loose cos>=0.4 cut) — asserted empirically in
    tests."""
    idx = build_srp_index(emb, dim, n_planes, seed, id_col, vec_col)
    a = idx.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("bucket").alias("ba"),
    )
    b = idx.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("bucket").alias("bb"),
    )
    cand = a.join(
        b,
        (F.col("id_a") < F.col("id_b"))
        & (F.bit_count(F.col("ba").bitwiseXOR(F.col("bb"))) <= max_hamming),
    )
    return (
        cand.select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    All-pairs formulation for correctness checking; the scale path pre-buckets
    with build_srp_index and joins on bucket first (same verify step).

    Per-vector work (quantization + norm) is hoisted BEFORE the pair join —
    evaluated |V| times instead of |V|² (inside the join each pair would
    re-quantize both 64-dim arrays; measured ~20× slower). The per-pair cost
    is one dot-product fold. The final cos expression reproduces the oracle's
    ``dot / (sqrt(na)·sqrt(nb))`` IEEE op order exactly."""
    if exact_engine_parity:
        qcol = _q6(F.col(vec_col))
        zero = F.lit(0).cast("long")
    else:
        qcol = _dbl(F.col(vec_col))
        zero = F.lit(0.0)
    sq_norm = _fold_sum(F.transform(qcol, lambda x: x * x), zero)

    def side(suffix: str) -> DataFrame:
        return emb.select(
            F.col(id_col).alias(f"id_{suffix}"),
            qcol.alias(f"q{suffix}"),
            F.sqrt(sq_norm.cast("double")).alias(f"n{suffix}"),
        )

    pairs = side("a").join(side("b"), F.col("id_a") < F.col("id_b"))
    dot_pair = _fold_sum(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y), zero
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            (dot_pair.cast("double") / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )
