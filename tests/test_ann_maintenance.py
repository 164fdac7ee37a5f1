"""Maintained IVF ANN index (streaming/ann_maintenance): the maintained
inverted lists equal the from-scratch batch build over all landed
vectors under any batch slicing; replay is idempotent; compaction
preserves index content and search results; search at nprobe=K equals
independent brute force; the probe filter is a storage-level partition
prune on the batch-dir layout; wrong-dimension vectors and centroid
drift fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import similarity as SIM
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.ann_maintenance import (
    IvfIndexMaintenance,
)

SCHEMA = "vec_id long, embedding array<double>"

# 3 well-separated centroid anchors in dim 4
CENTROIDS = [
    [10.0, 0.0, 0.0, 0.0],
    [0.0, 10.0, 0.0, 0.0],
    [0.0, 0.0, 10.0, 0.0],
]


def _vec(i: int) -> list[float]:
    # deterministic vectors clustered around the anchor i % 3, with a
    # small id-dependent offset so every vector is distinct
    base = [0.0] * 4
    base[i % 3] = 10.0
    base[3] = (i % 7) * 0.25
    base[(i + 1) % 3] += (i % 5) * 0.3
    return base


ROWS = [(i, _vec(i)) for i in range(60)]
BATCHES = [ROWS[:7], [], ROWS[7:40], ROWS[40:]]


def _store(spark, tmp_path, name="ivf") -> IvfIndexMaintenance:
    return IvfIndexMaintenance(
        spark, str(tmp_path / name), CENTROIDS
    )


def _feed(store, spark, batches):
    for i, b in enumerate(batches):
        store.process_batch(spark.createDataFrame(b, SCHEMA), i)


def _index_rows(df):
    return sorted(
        (r["id"], tuple(r["vec"]), r["cid"]) for r in df.collect()
    )


def _reference_index(spark, rows):
    emb = spark.createDataFrame(rows, SCHEMA)
    return SIM.build_ivf_index(emb, CENTROIDS).select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vec"),
        "cid",
    )


def test_maintained_equals_from_scratch_build(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(store, spark, BATCHES)
    assert _index_rows(store.index()) == _index_rows(
        _reference_index(spark, ROWS)
    )


def test_slicing_invariance_and_replay(spark, tmp_path):
    a = _store(spark, tmp_path, "a")
    _feed(a, spark, BATCHES)
    b = _store(spark, tmp_path, "b")
    _feed(b, spark, [ROWS])  # one big batch
    assert _index_rows(a.index()) == _index_rows(b.index())
    # at-least-once replay of an arbitrary earlier batch is a no-op
    a.process_batch(spark.createDataFrame(BATCHES[2], SCHEMA), 2)
    assert _index_rows(a.index()) == _index_rows(b.index())


def test_search_fullprobe_equals_brute_force(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(store, spark, BATCHES)
    q = [9.0, 1.0, 0.0, 0.5]
    exact = [r["id"] for r in store.search_exact(q, k=8).collect()]
    full = [r["id"] for r in store.search(q, k=8, nprobe=len(CENTROIDS)).collect()]
    assert full == exact
    # the pruned probe keeps the true top hits here: the query sits
    # inside one cluster and the data is well separated
    pruned = [r["id"] for r in store.search(q, k=8, nprobe=1).collect()]
    assert pruned[:3] == exact[:3]


def test_probe_is_partition_pruned(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(store, spark, BATCHES)
    pruned = store.index().filter(F.col("cid").isin(0, 1))
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cid" in pf and "IN" in pf, pf
    all_cids = {r["cid"] for r in store.index().select("cid").distinct().collect()}
    assert all_cids == {0, 1, 2}


def test_compaction_preserves_index_and_search(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(store, spark, BATCHES)
    q = [0.0, 9.5, 1.0, 0.2]
    before_idx = _index_rows(store.index())
    before_hits = [(r["id"], r["cos_sim"]) for r in store.search(q, k=6).collect()]
    store.compact(keep_last=1)
    assert _index_rows(store.index()) == before_idx
    assert [
        (r["id"], r["cos_sim"]) for r in store.search(q, k=6).collect()
    ] == before_hits
    # replay of the protected tail after compaction is still a no-op
    last = len(BATCHES) - 1
    store.process_batch(spark.createDataFrame(BATCHES[last], SCHEMA), last)
    assert _index_rows(store.index()) == before_idx


def test_null_rows_dropped_wrong_dim_raises(spark, tmp_path):
    store = _store(spark, tmp_path, "nulls")
    store.process_batch(
        spark.createDataFrame(
            [(1, _vec(1)), (None, _vec(2)), (3, None)], SCHEMA
        ),
        0,
    )
    assert [r["id"] for r in store.index().collect()] == ["1"]
    bad = spark.createDataFrame([(9, [1.0, 2.0, 3.0])], SCHEMA)
    with pytest.raises(Exception, match="mis-dimensioned|components"):
        store.process_batch(bad, 1)
    with pytest.raises(ValueError, match="query has"):
        store.search([1.0, 2.0], k=3)


def test_reopening_with_different_centroids_raises(spark, tmp_path):
    store = _store(spark, tmp_path, "meta")
    _feed(store, spark, [ROWS[:5]])
    # same matrix reopens fine
    IvfIndexMaintenance(spark, str(tmp_path / "meta"), CENTROIDS)
    drifted = [list(c) for c in CENTROIDS]
    drifted[0][0] += 1e-9
    with pytest.raises(ValueError, match="incompatible list assignments"):
        IvfIndexMaintenance(spark, str(tmp_path / "meta"), drifted)
    with pytest.raises(ValueError, match="ragged"):
        IvfIndexMaintenance(
            spark, str(tmp_path / "fresh"), [[1.0, 2.0], [1.0]]
        )


def test_list_sizes_bounded_health_stat(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(store, spark, BATCHES)
    sizes = {r["cid"]: r["n_vectors"] for r in store.list_sizes().collect()}
    assert sum(sizes.values()) == len(ROWS)
    assert set(sizes) == {0, 1, 2}


def test_live_stream_maintains_index(spark, tmp_path):
    """readStream -> foreachBatch(store.wrap(sink)): the maintained index
    equals the from-scratch build over everything streamed, and the sink
    still received every row unchanged."""
    src = str(tmp_path / "src")
    spark.createDataFrame(ROWS, SCHEMA).repartition(4).write.parquet(src)
    store = _store(spark, tmp_path, "live")
    landed = str(tmp_path / "landed")
    sink = lambda df, bid: df.write.mode("overwrite").parquet(  # noqa: E731
        f"{landed}/batch_id={bid}"
    )
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(store.wrap(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _index_rows(store.index()) == _index_rows(
        _reference_index(spark, ROWS)
    )
    assert spark.read.parquet(landed).count() == len(ROWS)


# ---------------------------------------------------------------------------
# IVF+PQ maintained composite (codes instead of raw vectors)
# ---------------------------------------------------------------------------
def _lossless_books(spark):
    """K >= corpus, iters=0: every subvector is its own codeword, so
    encoding is lossless and integer-parity ADC reproduces cosine_q6
    bitwise (the ivfpq_ann_exact configuration)."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.pq import (
        train_pq_codebooks,
    )

    emb = spark.createDataFrame(ROWS, SCHEMA)
    return train_pq_codebooks(
        emb, m=2, n_centroids=len(ROWS), iters=0, dim=4
    )


def _pq_store(spark, tmp_path, books, name="ivfpq"):
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.ann_maintenance import (
        IvfPqIndexMaintenance,
    )

    return IvfPqIndexMaintenance(
        spark, str(tmp_path / name), CENTROIDS, books
    )


def _code_rows(df):
    return sorted((r["id"], tuple(r["codes"]), r["cid"]) for r in df.collect())


def test_ivfpq_maintained_equals_batch_build(spark, tmp_path):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.pq import (
        build_ivfpq_index,
    )

    books = _lossless_books(spark)
    store = _pq_store(spark, tmp_path, books)
    _feed(store, spark, BATCHES)
    ref = build_ivfpq_index(
        spark.createDataFrame(ROWS, SCHEMA), CENTROIDS, books
    ).select(F.col("vec_id").cast("string").alias("id"), "codes", "cid")
    assert _code_rows(store.index()) == _code_rows(ref)
    # replay is a no-op
    store.process_batch(spark.createDataFrame(BATCHES[0], SCHEMA), 0)
    assert _code_rows(store.index()) == _code_rows(ref)


def test_ivfpq_lossless_fullprobe_equals_raw_brute_force(spark, tmp_path):
    """Doubly-degenerate config: nprobe=K coarse + lossless codes ==
    exact cosine over the raw vectors — pinned against the RAW store's
    independent brute-force baseline, not against another codes path."""
    books = _lossless_books(spark)
    pq = _pq_store(spark, tmp_path, books)
    raw = _store(spark, tmp_path, "rawtwin")
    _feed(pq, spark, BATCHES)
    _feed(raw, spark, BATCHES)
    q = [9.0, 1.0, 0.0, 0.5]
    exact = [r["id"] for r in raw.search_exact(q, k=8).collect()]
    adc = [
        r["id"]
        for r in pq.search(
            q, k=8, nprobe=len(CENTROIDS), exact_engine_parity=True
        ).collect()
    ]
    assert adc == exact
    # compaction preserves hits
    before = [tuple(r) for r in pq.search(q, k=8, nprobe=2).collect()]
    pq.compact(keep_last=1)
    assert [tuple(r) for r in pq.search(q, k=8, nprobe=2).collect()] == before


def test_ivfpq_contracts(spark, tmp_path):
    import pytest as _pt

    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.ann_maintenance import (
        IvfPqIndexMaintenance,
    )

    books = _lossless_books(spark)
    store = _pq_store(spark, tmp_path, books, "contracts")
    _feed(store, spark, [ROWS[:5]])
    # codes are lossy: no exact baseline from this store
    with _pt.raises(TypeError, match="lossy"):
        store.search_exact([1.0, 0.0, 0.0, 0.0])
    # codebook drift fails at open (same root, perturbed books)
    drifted = [[list(c) for c in book] for book in books]
    drifted[0][0][0] += 1e-9
    with _pt.raises(ValueError, match="incompatible list assignments"):
        _pq_store(spark, tmp_path, drifted, "contracts")
    # codebooks must tile the centroid dimension exactly
    with _pt.raises(ValueError, match="components, centroids"):
        IvfPqIndexMaintenance(
            spark, str(tmp_path / "fresh"), CENTROIDS, books[:1]
        )
    # raw and PQ stores under one root coexist (distinct subdirs + meta)
    raw = _store(spark, tmp_path, "contracts")
    _feed(raw, spark, [ROWS[:5]])
    assert raw.index().count() == store.index().count() == 5


def test_empty_or_all_invalid_batch_leaves_store_readable(spark, tmp_path):
    """partitionBy writes no part files for empty data, so a zero-valid-
    row batch must not leave a file-less batch_id dir that poisons every
    read with UNABLE_TO_INFER_SCHEMA (r12 review): reads stay usable
    before, between, and after such batches."""
    store = _store(spark, tmp_path, "empties")
    store.process_batch(
        spark.createDataFrame([], SCHEMA), 0
    )  # empty first batch
    assert store.index().count() == 0  # empty store still readable
    assert store.search([1.0, 0.0, 0.0, 0.0], k=3).collect() == []
    store.process_batch(
        spark.createDataFrame([(None, _vec(1)), (7, None)], SCHEMA), 1
    )  # all rows invalid
    store.process_batch(spark.createDataFrame(ROWS[:5], SCHEMA), 2)
    assert store.index().count() == 5
    assert len(store.search([9.0, 1.0, 0.0, 0.5], k=3).collect()) == 3
    # replaying a formerly non-empty batch as empty removes its rows
    store.process_batch(spark.createDataFrame([], SCHEMA), 2)
    assert store.index().count() == 0


def test_midwrite_contract_failure_does_not_poison_store(spark, tmp_path):
    """A batch mixing valid rows with one wrong-dimension vector passes
    the isEmpty pre-probe (it stops at the first row) and the contract
    raise_error then fires INSIDE the distributed write. The partial
    batch_id dir must be removed on failure (r12 advice) so later reads
    see the explanatory contract error once, not
    UNABLE_TO_INFER_SCHEMA forever."""
    import glob as _glob

    store = _store(spark, tmp_path, "midwrite")
    store.process_batch(spark.createDataFrame(ROWS[:5], SCHEMA), 0)
    mixed = spark.createDataFrame(
        ROWS[5:9] + [(99, [1.0, 2.0, 3.0])], SCHEMA
    )
    with pytest.raises(Exception, match="mis-dimensioned|components"):
        store.process_batch(mixed, 1)
    # the failed batch left no directory behind ...
    assert not _glob.glob(
        str(tmp_path / "midwrite" / "ivf_index" / "batch_id=1")
    )
    # ... and the store reads exactly batch 0, with search still usable
    assert sorted(r["id"] for r in store.index().collect()) == sorted(
        str(i) for i, _ in ROWS[:5]
    )
    assert len(store.search([9.0, 1.0, 0.0, 0.5], k=3).collect()) == 3
    # the retried batch (violating row repaired upstream) lands cleanly
    store.process_batch(spark.createDataFrame(ROWS[5:9], SCHEMA), 1)
    assert store.index().count() == 9


def test_ivfpq_resplit_codebooks_fail_at_open(spark, tmp_path):
    """A codebook tensor with the SAME flattened centroids but different
    book boundaries encodes mutually meaningless codes — the meta
    fingerprint must be structure-preserving (r12 review)."""
    import pytest as _pt

    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.ann_maintenance import (
        IvfPqIndexMaintenance,
    )

    # dim 4, d_sub 2: two valid splits of the same 3 flattened codewords
    a, b, c = [1.0, 2.0], [3.0, 4.0], [5.0, 6.0]
    books1 = [[a, b], [c]]  # m=2, Ks (2, 1)
    books2 = [[a], [b, c]]  # m=2, Ks (1, 2) — same flattened list
    s1 = IvfPqIndexMaintenance(
        spark, str(tmp_path / "resplit"), CENTROIDS, books1
    )
    _feed(s1, spark, [ROWS[:3]])
    with _pt.raises(ValueError, match="incompatible list assignments"):
        IvfPqIndexMaintenance(
            spark, str(tmp_path / "resplit"), CENTROIDS, books2
        )
