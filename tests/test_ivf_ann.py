"""IVF ANN properties: full probe is exactly brute force; partial probe
keeps useful recall while scanning a fraction of the lists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import similarity as SIM
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS

K_CENTROIDS = 8


@pytest.fixture(scope="module")
def ivf(spark):
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    centroids = SIM.train_ivf_centroids(emb, n_centroids=K_CENTROIDS, iters=3)
    index = SIM.build_ivf_index(emb, centroids).persist()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    yield emb, centroids, index, qvec
    index.unpersist()


def test_full_probe_equals_brute_force(spark, ivf):
    emb, centroids, index, qvec = ivf
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    brute = [r["vec_id"] for r in SIM.brute_force_topk(emb, query, k=10).collect()]
    full = [
        r["vec_id"]
        for r in SIM.ivf_topk(index, qvec, centroids, k=10, nprobe=K_CENTROIDS).collect()
    ]
    assert full == brute


def test_partial_probe_recall_and_pruning(spark, ivf):
    emb, centroids, index, qvec = ivf
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    brute = {r["vec_id"] for r in SIM.brute_force_topk(emb, query, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in SIM.ivf_topk(index, qvec, centroids, k=10, nprobe=4).collect()
    }
    assert len(approx & brute) / len(brute) >= 0.5  # recall@10

    # the probe must actually prune: scanned lists hold < the full corpus
    probed = index.filter(F.col("cid").isin(*range(4))).count()
    assert index.count() > 0
    assert probed < index.count()


def test_index_covers_corpus_and_balances(spark, ivf):
    emb, centroids, index, qvec = ivf
    assert index.count() == emb.count()
    sizes = [r["n"] for r in index.groupBy("cid").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) > 1  # k-means actually split the space


def test_persisted_index_probe_prunes_partitions(spark, ivf, tmp_path):
    """The SCALE.md claim made mechanical: with the inverted lists persisted
    partitionBy(cid), a probe's `cid IN (...)` filter prunes at the STORAGE
    level — the executed scan touches only the probed cid directories —
    and returns exactly what the in-memory index returns."""
    emb, centroids, index, qvec = ivf
    path = str(tmp_path / "ivf_index")
    SIM.write_ivf_index(index, path)
    disk = SIM.read_ivf_index(spark, path)

    mem = SIM.ivf_topk(index, qvec, centroids, k=10, nprobe=2).collect()
    dsk = SIM.ivf_topk(disk, qvec, centroids, k=10, nprobe=2).collect()
    assert [r["vec_id"] for r in dsk] == [r["vec_id"] for r in mem]

    # the scan must carry a PARTITION filter on cid (storage-level prune:
    # only the probed cid=... directories are listed/read), not a post-scan
    # data filter over all partitions
    dists = [
        (sum((x - c[i]) ** 2 for i, x in enumerate(qvec)), cid)
        for cid, c in enumerate(centroids)
    ]
    probe_cids = {cid for _, cid in sorted(dists)[:2]}
    pruned = disk.filter(F.col("cid").isin(*probe_cids))
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cid" in pf and "IN" in pf, pf
    # and the index genuinely spans more cids than the probe admits
    all_cids = {r["cid"] for r in disk.select("cid").distinct().collect()}
    assert len(all_cids) > len(probe_cids)


def test_append_ivf_index_equals_full_rebuild(spark, ivf, tmp_path):
    emb, centroids, _, qvec = ivf
    path = str(tmp_path / "ivf_inc")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    SIM.write_ivf_index(SIM.build_ivf_index(old, centroids), path)
    # incremental: only the new batch is assigned; history untouched
    SIM.append_ivf_index(new, centroids, path)
    grown = SIM.read_ivf_index(spark, path)
    assert grown.count() == emb.count()
    # probes over the grown store match a from-scratch rebuild exactly
    rebuilt = SIM.build_ivf_index(emb, centroids)
    for nprobe in (2, K_CENTROIDS):
        a = [
            r["vec_id"]
            for r in SIM.ivf_topk(grown, qvec, centroids, k=10, nprobe=nprobe).collect()
        ]
        b = [
            r["vec_id"]
            for r in SIM.ivf_topk(rebuilt, qvec, centroids, k=10, nprobe=nprobe).collect()
        ]
        assert a == b


# -- batch exact k-NN join ---------------------------------------------------


def test_knn_join_matches_per_query_bruteforce(spark):
    """knn_join == brute_force_topk run per query (same tie rule), on a
    deliberately multi-partition corpus so the partition-local top-k +
    final window path is exercised."""
    import random

    from example_cdk_dynamodb_stream_to_redshift_spark.operators import (
        similarity as SIM,
    )

    random.seed(11)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(300)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(16)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )
    got = {
        (r["q_id"], r["vec_id"]): r["cos_sim"]
        for r in SIM.knn_join(emb, queries, k=7).collect()
    }
    assert len(got) == 5 * 7
    for qid in range(5):
        q = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("q")
        )
        want = SIM.brute_force_topk(emb, q, k=7).collect()
        for r in want:
            assert got[(qid, r["vec_id"])] == pytest.approx(r["cos_sim"], abs=1e-12)
        # self is always rank-1 with cos ~1
        assert got[(qid, qid)] == pytest.approx(1.0, abs=1e-9)


def test_knn_join_empty_queries(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators import (
        similarity as SIM,
    )

    emb = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<float>"
    )
    out = SIM.knn_join(emb, emb.filter("vec_id < 0").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    ), k=3)
    assert out.count() == 0
    assert out.columns == ["q_id", "vec_id", "cos_sim"]


def test_ivf_knn_join_fullprobe_is_exact(spark):
    """nprobe=K: the IVF-pruned batch k-NN must equal the exact knn_join
    on every (q_id, neighbor, sim) triple."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    centroids = SIM.train_ivf_centroids(emb, n_centroids=8, iters=3)
    index = SIM.build_ivf_index(emb, centroids)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )
    got = sorted(
        (r["q_id"], r["vec_id"], round(r["cos_sim"], 10))
        for r in SIM.ivf_knn_join(
            index, queries, centroids, k=5, nprobe=8
        ).collect()
    )
    want = sorted(
        (r["q_id"], r["vec_id"], round(r["cos_sim"], 10))
        for r in SIM.knn_join(emb, queries, k=5).collect()
    )
    assert got == want


def test_ivf_knn_join_partial_probe_recall(spark):
    """nprobe=4 of 8: per-query recall vs exact top-5 stays useful (the
    standard IVF trade; self-match always recalled since a query's own
    list is its nearest centroid)."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    centroids = SIM.train_ivf_centroids(emb, n_centroids=8, iters=3)
    index = SIM.build_ivf_index(emb, centroids)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )
    approx = SIM.ivf_knn_join(index, queries, centroids, k=5, nprobe=4).collect()
    exact = SIM.knn_join(emb, queries, k=5).collect()
    approx_set = {(r["q_id"], r["vec_id"]) for r in approx}
    exact_set = {(r["q_id"], r["vec_id"]) for r in exact}
    # every query still returns k rows, from its probed lists
    assert len(approx) == 8 * 5
    recall = len(approx_set & exact_set) / len(exact_set)
    assert recall >= 0.5, recall
    assert all((q, q) in approx_set for q in range(8))  # self recalled


def test_knn_join_chunked_equals_unchunked(spark):
    """q_chunk_rows bounds the broadcast query matrix in code: splitting
    the query set into successive broadcast+scan passes must be
    row-identical to the single-pass join (per-query results are
    independent), including a ragged final chunk and chunk == 1."""
    import random

    from example_cdk_dynamodb_stream_to_redshift_spark.operators import (
        similarity as SIM,
    )

    random.seed(23)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(8)
    queries = emb.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )

    def result(**kw):
        return sorted(
            (r["q_id"], r["vec_id"], round(r["cos_sim"], 12))
            for r in SIM.knn_join(emb, queries, k=4, **kw).collect()
        )

    base = result()
    assert len(base) == 7 * 4
    assert result(q_chunk_rows=3) == base  # 3+3+1: ragged tail
    assert result(q_chunk_rows=1) == base  # degenerate: one scan per query
    assert result(q_chunk_rows=500) == base  # bound above Q: single pass
