"""Product quantization (PQ) ANN: trained sub-codebooks, byte codes, ADC.

The third member of the ANN family next to SRP-LSH and IVF
(operators/similarity.py). PQ attacks a different axis: instead of pruning
WHICH vectors a probe scans (IVF partitions, SRP buckets), it shrinks WHAT
a scan reads — each vector becomes M small codes (M bytes at K<=256), a
16-64x reduction vs float32, and query scoring becomes M table lookups
plus integer adds (no per-component float math on the scan side at all).
At 100 TB the codes table for a 64-dim float corpus is ~1.5 TB: the
difference between an ANN scan that fits in cluster page cache and one
that doesn't. Jegou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public method, Spark-first implementation.

Plan shape (serving all JVM-side, no UDFs; training Arrow-batched):
- training: per-subspace Lloyd's k-means — each iteration is ONE
  Arrow-batched kernel pass emitting bounded per-partition
  (s, cid, count, sum) partials, reduced driver-side; only the
  M x K x d_sub codebook (a few KB) ever reaches the driver.
- encode: per-subspace nearest-centroid assignment is the same codegen
  ``array_min(array(struct(dist, cid)...))`` expression as IVF — one
  narrow projection, no shuffle.
- query: the asymmetric-distance (ADC) tables (M x K partial dots and
  partial squared norms) are computed driver-side from the ONE query
  vector and broadcast as array literals; per-row score is
  ``zip_with(codes, table, (c, t) -> t[c])`` folded with an integer/double
  sum — whole-stage codegen, then TakeOrderedAndProject for top-k.

Exactness dial (mirrors ivf_ann_fullprobe / srp_ann_exact): with
``n_centroids >= |corpus|`` and ``iters=0`` the init (first K subvectors
by id) makes every codebook contain every subvector, encoding is lossless,
and the integer-parity ADC reproduces ``cosine_q6`` BITWISE — per-subspace
int64 partial dots/norms sum to exactly the full-vector quantities because
integer addition is associative. That configuration is hash-checked
against the same DuckDB brute-force oracle as ann_bruteforce_topk.

Reference tie-in: the reference (sql/queries.sql) has no vector surface;
this extends the engine's training-data-pipeline family per SURVEY.md.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _assign_cid, _dbl, _dlit


def _py_q6(x: float) -> int:
    """round(x * 1e6) with HALF_UP (away from zero) — the driver-side twin
    of similarity._q6 / DuckDB round(); Python's built-in round is
    banker's and would differ on exact .5 grid points."""
    v = float(x) * 1_000_000
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    n_centroids: int = 16,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """M per-subspace codebooks by Lloyd's k-means (deterministic first-K
    init, the IVF trainer's scheme), ALL subspaces trained together: one
    Arrow-batched distributed pass per iteration — the kernel slices
    each vector into its M subvectors in numpy, assigns every subspace
    against its broadcast codebook with one BLAS distance matrix, and
    emits per-PARTITION (s, cid, count, component-sum) partials: at most
    m*K rows per partition, so the collect is the bounded
    O(partitions*m*K*d_sub) artifact class and the means reduce on the
    driver with no shuffle. Only the m x K x (dim/m) codebook reaches
    the driver. (Replaces the per-iteration codegen CASE-assignment +
    posexplode per-component aggregation, which paid ~3s/iteration in
    plan compilation alone — this kernel's plan never changes across
    iterations, only the broadcast value.) Same tie/ulp caveats as
    ``similarity.train_ivf_centroids``; the lossless iters=0 config —
    the exactness-bearing one — never enters this loop.
    Returns books[m][k][i]."""
    import numpy as np  # noqa: F811

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    init = (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(_dbl(F.col(vec_col)).alias("_v"))
        .collect()
    )
    books = [
        [[float(r["_v"][s * d_sub + i]) for i in range(d_sub)] for r in init]
        for s in range(m)
    ]
    if not iters:
        return books
    sc = emb.sparkSession.sparkContext
    vecs = emb.select(_dbl(F.col(vec_col)).alias("_v"))
    for _ in range(iters):
        bc = sc.broadcast(np.asarray(books, dtype=np.float64))  # m x K x d_sub

        def part_stats(batches):
            # self-contained: executors don't share driver sys.path
            import numpy as np
            import pandas as pd

            bmat = bc.value
            m_, k_, ds = bmat.shape
            counts = np.zeros((m_, k_), dtype=np.int64)
            sums = np.zeros((m_, k_, ds), dtype=np.float64)
            bn = (bmat * bmat).sum(axis=2)  # m x K
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.asarray(pdf["_v"].tolist(), dtype=np.float64)
                for s in range(m_):
                    sub = x[:, s * ds : (s + 1) * ds]
                    d2 = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2.0 * (sub @ bmat[s].T)
                        + bn[s][None, :]
                    )
                    cid = d2.argmin(axis=1)
                    for c in np.unique(cid):
                        mask = cid == c
                        counts[s, c] += int(mask.sum())
                        sums[s, c] += sub[mask].sum(axis=0)
            ss, cc = counts.nonzero()
            if len(ss):
                yield pd.DataFrame(
                    {
                        "s": ss.astype("int32"),
                        "cid": cc.astype("int32"),
                        "n": counts[ss, cc],
                        "sums": [sums[s, c].tolist() for s, c in zip(ss, cc)],
                    }
                )

        partials = vecs.mapInPandas(
            part_stats, "s int, cid int, n long, sums array<double>"
        ).collect()
        agg_n = np.zeros((m, n_centroids), dtype=np.int64)
        agg_s = np.zeros((m, n_centroids, d_sub), dtype=np.float64)
        for r in partials:
            agg_n[r["s"], r["cid"]] += r["n"]
            agg_s[r["s"], r["cid"]] += np.asarray(r["sums"], dtype=np.float64)
        books = [
            [
                (agg_s[s, c] / agg_n[s, c]).tolist()
                if agg_n[s, c]
                else books[s][c]
                for c in range(n_centroids)
            ]
            for s in range(m)
        ]
    return books


def pq_code_expr(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """``array<int>`` of per-subspace nearest-centroid codes over an
    array<double> column — the one PQ encode expression, shared by
    ``pq_encode``, ``build_ivfpq_index``, and the maintained store
    (streaming/ann_maintenance) so the code layout has exactly one
    implementation."""
    d_sub = len(codebooks[0][0])
    return F.array(
        *[
            _assign_cid(F.slice(vec, s * d_sub + 1, d_sub), book).cast("int")
            for s, book in enumerate(codebooks)
        ]
    )


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> length M): per-subspace nearest-centroid ids,
    one codegen projection per row — the persisted PQ index. At scale this
    is the table that replaces the float corpus for ANN serving."""
    return emb.select(
        F.col(id_col),
        pq_code_expr(_dbl(F.col(vec_col)), codebooks).alias("codes"),
    )


def _lut_lit(table: list[list[int | float]], cell_type: str) -> Column:
    """ADC lookup-table literal in ONE expression-parse call (py4j
    round-trips per cell made the per-element F.lit form the dominant
    driver cost — see similarity.double_array_lit)."""
    if cell_type == "long":
        cell = lambda v: f"{int(v)}L"  # noqa: E731
    elif cell_type == "double":
        cell = _dlit  # noqa: E731
    else:
        raise ValueError(f"unsupported ADC cell type: {cell_type}")
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(cell(v) for v in row) + ")" for row in table
        )
        + ")"
    )


def _lookup_sum(codes: Column, lut: Column, zero) -> Column:
    """sum_m lut[m][codes[m]] as one codegen expression."""
    return F.aggregate(
        F.zip_with(codes, lut, lambda c, t: F.element_at(t, c + F.lit(1))),
        zero,
        lambda acc, x: acc + x,
    )


def build_ivfpq_index(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, codes): the IVF+PQ composite index — coarse-quantizer
    list assignment for WHICH rows a probe reads, PQ codes for WHAT it
    reads (the FAISS IVFPQ layout, Jegou et al. 2011 §IV). Persisted
    ``partitionBy(cid)`` this is the 100 TB ANN store: a probe is a
    partition-pruned scan of nprobe/K of the corpus at 1/16-1/64 the
    bytes of float32."""
    from .similarity import _assign_cid

    return emb.select(
        F.col(id_col),
        _assign_cid(F.col(vec_col), centroids).alias("cid"),
        pq_code_expr(_dbl(F.col(vec_col)), codebooks).alias("codes"),
    )


def ivfpq_topk(
    index: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Probe the nprobe nearest inverted lists, ADC-score their codes.
    Probe selection is O(K) on the driver (same as ivf_topk); the scan is
    the pruned code partitions only. ``nprobe == K`` with a lossless
    codebook degrades to exact brute force — the driver-checkable
    configuration."""
    dists = [
        (sum((x - c[i]) ** 2 for i, x in enumerate(query_vec)), cid)
        for cid, c in enumerate(centroids)
    ]
    probe_cids = [cid for _, cid in sorted(dists)[:nprobe]]
    pruned = index.filter(F.col("cid").isin(probe_cids)).select(
        id_col, "codes"
    )
    return pq_adc_topk(
        pruned,
        query_vec,
        codebooks,
        k=k,
        id_col=id_col,
        exact_engine_parity=exact_engine_parity,
    )


def pq_adc_topk(
    codes_df: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Cosine top-k over the codes table by asymmetric distance: the scan
    reads only (id, codes) and does M array lookups + M adds per row.

    ``exact_engine_parity`` scores on the same 1e-6 int64 grid as
    similarity.cosine_q6 (tables built from quantized components, integer
    partial sums) so the lossless configuration is bit-identical to brute
    force across engines; the default float path is the production ADC.
    """
    d_sub = len(codebooks[0][0])
    if exact_engine_parity:
        qq = [_py_q6(x) for x in query_vec]
        dot_t = [
            [
                sum(
                    qq[s * d_sub + i] * _py_q6(c[i]) for i in range(d_sub)
                )
                for c in book
            ]
            for s, book in enumerate(codebooks)
        ]
        nrm_t = [
            [sum(_py_q6(c[i]) ** 2 for i in range(d_sub)) for c in book]
            for book in codebooks
        ]
        na = float(math.sqrt(sum(v * v for v in qq)))
        d_int = _lookup_sum(
            F.col("codes"), _lut_lit(dot_t, "long"), F.lit(0).cast("long")
        )
        nb_int = _lookup_sum(
            F.col("codes"), _lut_lit(nrm_t, "long"), F.lit(0).cast("long")
        )
        cos = d_int.cast("double") / (
            F.lit(na) * F.sqrt(nb_int.cast("double"))
        )
    else:
        qf = [float(x) for x in query_vec]
        dot_t = [
            [
                sum(qf[s * d_sub + i] * float(c[i]) for i in range(d_sub))
                for c in book
            ]
            for s, book in enumerate(codebooks)
        ]
        nrm_t = [
            [sum(float(c[i]) ** 2 for i in range(d_sub)) for c in book]
            for book in codebooks
        ]
        na = math.sqrt(sum(v * v for v in qf))
        d_f = _lookup_sum(
            F.col("codes"), _lut_lit(dot_t, "double"), F.lit(0.0)
        )
        nb_f = _lookup_sum(
            F.col("codes"), _lut_lit(nrm_t, "double"), F.lit(0.0)
        )
        cos = d_f / (F.lit(na) * F.sqrt(nb_f))
    return (
        codes_df.select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def pq_rerank_topk(
    shortlist: DataFrame,
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_engine_parity: bool = False,
) -> DataFrame:
    """Exact-rerank a PQ/ADC shortlist against the raw vectors: the
    standard two-phase PQ serving pattern (Jegou et al. 2011 §V.C —
    codes give a cheap candidate shortlist at quantization resolution,
    the final order comes from exact distances on candidates only).

    ``shortlist`` is any (id)-bearing frame — typically
    ``pq_adc_topk``/``ivfpq_topk`` with k at shortlist size (hundreds);
    its ids semi-join ``emb`` BROADCAST, so the corpus pays one
    hash-probe scan reading only candidate rows' vectors (the
    exact_recount two-phase shape), never a shuffle of non-candidates.
    Within-code ties that ADC cannot order — all vectors sharing a code
    score identically — are resolved here by the true cosine.
    """
    from .similarity import cosine, cosine_q6, double_array_lit

    ids = shortlist.select(F.col(id_col).cast("string").alias("_sl_id"))
    qcol = double_array_lit([float(x) for x in query_vec])
    sim = cosine_q6 if exact_engine_parity else cosine
    return (
        emb.join(
            F.broadcast(ids),
            F.col(id_col).cast("string") == F.col("_sl_id"),
            "left_semi",
        )
        .select(F.col(id_col), sim(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
