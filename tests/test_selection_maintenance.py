"""Micro-batch-maintained budget histograms
(streaming/selection_maintenance.BudgetHistogram): the maintained
store equals the direct histogram under any batch slicing, selection
from the store equals the exact global-window definition over the
landed corpus, replay is idempotent, and the negative-weight guard
propagates through the stored wmin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.selection import (
    budget_select_exact,
    uniform_edges,
    weight_histogram,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.selection_maintenance import (
    BudgetHistogram,
)

EDGES = uniform_edges(8)
SCHEMA = "doc_id long, score double, w long"

BATCHES = [
    [(0, 0.95, 40), (1, 0.81, 10), (2, 0.44, 30)],
    [(3, 0.92, 25), (4, 0.13, 5), (5, 0.67, 0)],
    [],  # an idle micro-batch must not disturb the store
    [(6, 0.95, 7), (7, 0.05, 9), (8, 0.71, 12)],
]


def _store(spark, tmp_path, name="bh"):
    return BudgetHistogram(spark, "score", "w", EDGES, str(tmp_path / name))


def _landed(spark, n_batches=len(BATCHES)):
    rows = [r for b in BATCHES[:n_batches] for r in b]
    return spark.createDataFrame(rows, SCHEMA)


def _feed(spark, store, n_batches=len(BATCHES)):
    for i, b in enumerate(BATCHES[:n_batches]):
        store.process_batch(spark.createDataFrame(b, SCHEMA), i)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintained_equals_direct_over_any_batching(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store)
    direct = weight_histogram(_landed(spark), "score", "w", EDGES)
    assert _sorted_rows(store.histogram()) == _sorted_rows(direct)
    # and a different slicing (one big batch) agrees too
    store2 = _store(spark, tmp_path, "bh2")
    store2.process_batch(_landed(spark), 0)
    assert _sorted_rows(store2.histogram()) == _sorted_rows(direct)


@pytest.mark.parametrize("budget", [0, 20, 47, 48, 60, 95, 10_000])
def test_select_from_store_equals_exact_over_landed(spark, tmp_path, budget):
    store = _store(spark, tmp_path, f"b{budget}")
    _feed(spark, store)
    corpus = _landed(spark)
    got = sorted(
        r["doc_id"] for r in store.select(corpus, budget, "doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in budget_select_exact(
            corpus, "score", "w", budget, "doc_id"
        ).collect()
    )
    assert got == want, budget


def test_replay_overwrites_itself(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store)
    before = _sorted_rows(store.histogram())
    # at-least-once redelivery of batch 1
    store.process_batch(spark.createDataFrame(BATCHES[1], SCHEMA), 1)
    assert _sorted_rows(store.histogram()) == before


def test_wrap_passes_batch_through_unchanged(spark, tmp_path):
    store = _store(spark, tmp_path)
    seen = []
    fn = store.wrap(lambda df, bid: seen.append((bid, df.count())))
    fn(spark.createDataFrame(BATCHES[0], SCHEMA), 0)
    assert seen == [(0, 3)]
    assert store.histogram().count() > 0


def test_negative_weight_in_a_batch_poisons_selection(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.process_batch(
        spark.createDataFrame([(0, 0.9, 10), (1, 0.5, -3)], SCHEMA), 0
    )
    corpus = spark.createDataFrame([(0, 0.9, 10), (1, 0.5, -3)], SCHEMA)
    with pytest.raises(Exception, match="non-negative"):
        store.select(corpus, 15, "doc_id").collect()


def test_compaction_preserves_the_cumulative_histogram(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store)
    before = _sorted_rows(store.histogram())
    store.compact(keep_last=1)
    assert _sorted_rows(store.histogram()) == before


def test_eligibility_matches_selection(spark, tmp_path):
    """The store must histogram exactly the rows budget_select treats
    as eligible — NULL/NaN scores and NULL weights excluded — or the
    stored totals misplace the boundary."""
    rows = [
        (0, 0.9, 10),
        (1, None, 5),
        (2, float("nan"), 5),
        (3, 0.7, None),
        (4, 0.6, 20),
    ]
    store = _store(spark, tmp_path)
    df = spark.createDataFrame(rows, SCHEMA)
    store.process_batch(df, 0)
    total = store.histogram().agg(F.sum("w")).collect()[0][0]
    assert total == 30  # only docs 0 and 4 count
    got = sorted(r["doc_id"] for r in store.select(df, 30, "doc_id").collect())
    assert got == [0, 4]


def test_streams_and_composes_with_quality_gate(spark, tmp_path):
    """Live readStream drive of gate.wrap(budget_hist.wrap(sink)): the
    gate quarantines contract violators, the store counts only CLEAN
    tokens, the sink receives every clean row, and selection from the
    store over the landed-clean corpus equals the exact definition."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.expectations import (
        in_range,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.quality_monitor import (
        QualityGate,
    )

    src = str(tmp_path / "src")
    rows = [
        (i, -1.0 if i % 10 == 0 else (i % 97) / 97.0, 10 + i % 7)
        for i in range(80)
    ]
    spark.createDataFrame(rows, SCHEMA).repartition(4).write.parquet(src)

    gate = QualityGate(
        spark, [in_range("score", 0.0, 1.0)], str(tmp_path / "gate")
    )
    store = _store(spark, tmp_path, "stream_store")
    landed = str(tmp_path / "landed")
    sink = lambda df, bid: df.write.mode("overwrite").parquet(  # noqa: E731
        f"{landed}/batch_id={bid}"
    )
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(gate.wrap(store.wrap(sink)))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"

    corpus = spark.read.parquet(landed)
    n_clean = corpus.count()
    assert n_clean == sum(1 for _, s, _ in rows if 0.0 <= s <= 1.0)
    total_w = store.histogram().agg(F.sum("w")).collect()[0][0]
    assert total_w == sum(w for _, s, w in rows if 0.0 <= s <= 1.0)
    assert (
        store.batch_histograms().select("batch_id").distinct().count() >= 2
    )
    budget = total_w // 3
    got = sorted(
        r["doc_id"] for r in store.select(corpus, budget, "doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in budget_select_exact(
            corpus, "score", "w", budget, "doc_id"
        ).collect()
    )
    assert got == want and 0 < len(got) < n_clean
