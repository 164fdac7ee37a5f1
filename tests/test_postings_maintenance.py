"""Maintained postings index (streaming/postings_maintenance): the
accumulated index equals the batch build over all landed docs under any
batch slicing; bm25_topk matches an independent pure-Python Okapi BM25
across batchings, replay, and compaction; the probe is a storage-level
partition prune; layout drift (n_buckets) fails at open; empty batches
leave every store readable."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.postings import (
    build_postings_index,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.postings_maintenance import (
    PostingsIndexMaintenance,
)

SCHEMA = "doc_id long, text string"

DOCS = [
    (1, "spark streams land rows in parquet tables"),
    (2, "parquet tables hold rows of data for spark"),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "bm25 ranks documents by term frequency and length"),
    (5, "spark spark spark everywhere in this document"),
    (6, "a short doc"),
    (7, "another document about ranking documents with terms"),
    (8, "rows and rows and rows of parquet"),
]
BATCHES = [DOCS[:3], [], DOCS[3:6], DOCS[6:]]
QUERY = ["spark", "parquet", "rows"]


def _store(spark, tmp_path, name="pidx", n_buckets=8):
    return PostingsIndexMaintenance(
        spark, str(tmp_path / name), n_buckets=n_buckets
    )


def _feed(store, spark, batches):
    for i, b in enumerate(batches):
        store.process_batch(spark.createDataFrame(b, SCHEMA), i)


def _py_bm25(docs, query, k=10, k1=1.2, b=0.75):
    """Independent reference: Okapi BM25 with the engine's idf form,
    rounded to 6 decimals, (score desc, doc_id asc) top-k."""
    toks = {i: t.split(" ") for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in query:
        matching = {i: v.count(term) for i, v in toks.items() if term in v}
        df = len(matching)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, tf in matching.items():
            dl = len(toks[i])
            s = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    ranked = sorted(
        ((round(s, 6), i) for i, s in scores.items()),
        key=lambda x: (-x[0], x[1]),
    )
    return [(str(i), s) for s, i in ranked[:k]]


def _hits(df):
    return [(r["doc_id"], r["bm25"]) for r in df.collect()]


def test_maintained_postings_equal_batch_build_and_slicing(spark, tmp_path):
    a = _store(spark, tmp_path, "a")
    _feed(a, spark, BATCHES)
    ref = build_postings_index(
        spark.createDataFrame(DOCS, SCHEMA).select(
            F.col("doc_id").cast("string").alias("doc_id"), "text"
        ),
        n_buckets=8,
    )
    got = sorted(tuple(r) for r in a.postings().collect())
    want = sorted(tuple(r) for r in ref.select("tb", "term", "doc_id", "tf").collect())
    assert got == want
    b = _store(spark, tmp_path, "b")
    _feed(b, spark, [DOCS])
    assert sorted(tuple(r) for r in b.postings().collect()) == want


def test_bm25_matches_python_reference_and_replay(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(store, spark, BATCHES)
    want = _py_bm25(DOCS, QUERY, k=5)
    assert _hits(store.bm25_topk(QUERY, k=5)) == want
    # at-least-once replay of a mid-stream batch changes nothing
    store.process_batch(spark.createDataFrame(BATCHES[2], SCHEMA), 2)
    assert _hits(store.bm25_topk(QUERY, k=5)) == want
    # corpus stats derive from kilobyte partials, exactly
    stats = store.corpus_stats().first()
    assert stats["n_docs"] == len(DOCS)
    total = sum(len(t.split(" ")) for _, t in DOCS)
    assert stats["avgdl"] == pytest.approx(total / len(DOCS))


def _py_bm25_multirow(doc_rows, query, k=10, k1=1.2, b=0.75):
    """Reference that models UPSTREAM IDENTITY VIOLATIONS the way the
    store contract documents them: each landed row is a separate corpus
    member for n_docs/avgdl/df/tf, but scores fold per doc_id (the
    groupBy) with each tf row joined to exactly ONE dl."""
    toks = [(str(i), t.split(" ")) for i, t in doc_rows]
    n = len(toks)
    avgdl = sum(len(v) for _, v in toks) / n
    scores: dict = {}
    for term in query:
        matching = [
            (i, v.count(term), len(v)) for i, v in toks if term in v
        ]
        df = len(matching)
        if not df:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, tf, dl in matching:
            s = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )
            scores[i] = scores.get(i, 0.0) + s
    ranked = sorted(
        ((round(s, 6), i) for i, s in scores.items()), key=lambda x: (-x[0], x[1])
    )
    return [(i, s) for s, i in ranked[:k]]


def test_reingested_doc_inflates_additively_not_multiplicatively(
    spark, tmp_path
):
    """A doc_id re-ingested across batches (the documented upstream
    identity violation) duplicates its postings rows — df and the
    summed score inflate ADDITIVELY and visibly. The dl side must
    collapse to ONE row per doc_id before the tf-dl join: duplicate dl
    rows would multiply against duplicate tf rows and inflate the score
    MULTIPLICATIVELY (r12 advice)."""
    store = _store(spark, tmp_path, "dup")
    store.process_batch(spark.createDataFrame(DOCS, SCHEMA), 0)
    store.process_batch(spark.createDataFrame([DOCS[0]], SCHEMA), 1)
    want = _py_bm25_multirow(DOCS + [DOCS[0]], QUERY, k=5)
    assert _hits(store.bm25_topk(QUERY, k=5)) == want
    # the additive model really is what landed: doc 1's score grew vs the
    # clean corpus (visible), but did NOT square (the multiplicative bug
    # would join 2 tf rows x 2 dl rows)
    clean = dict(_py_bm25(DOCS, QUERY, k=8))
    got = dict(_hits(store.bm25_topk(QUERY, k=8)))
    assert got["1"] > clean["1"]


def test_probe_is_partition_pruned(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(store, spark, BATCHES)
    plan = store.probe(QUERY)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "tb" in pf and "IN" in pf, pf
    all_tb = {r["tb"] for r in store.postings().select("tb").distinct().collect()}
    assert len(all_tb) > 1  # the prune has something to prune


def test_compaction_preserves_index_and_search(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(store, spark, BATCHES)
    before_post = sorted(tuple(r) for r in store.postings().collect())
    before_hits = _hits(store.bm25_topk(QUERY, k=5))
    store.compact(keep_last=1)
    assert sorted(tuple(r) for r in store.postings().collect()) == before_post
    assert _hits(store.bm25_topk(QUERY, k=5)) == before_hits
    # replay of the protected tail post-compaction is still a no-op
    last = len(BATCHES) - 1
    store.process_batch(spark.createDataFrame(BATCHES[last], SCHEMA), last)
    assert _hits(store.bm25_topk(QUERY, k=5)) == before_hits


def test_empty_and_null_batches_leave_stores_readable(spark, tmp_path):
    store = _store(spark, tmp_path, "empties")
    store.process_batch(spark.createDataFrame([], SCHEMA), 0)
    assert store.postings().count() == 0
    assert store.corpus_stats().first()["n_docs"] == 0.0
    # NULL id dropped; NULL text = a doc with no postings but a stats row
    store.process_batch(
        spark.createDataFrame([(None, "ghost text"), (9, None)], SCHEMA), 1
    )
    assert store.postings().count() == 0
    assert store.doc_stats().collect() == [("9", 0)]
    store.process_batch(spark.createDataFrame(DOCS[:2], SCHEMA), 2)
    assert len(_hits(store.bm25_topk(QUERY, k=3))) > 0


def test_layout_drift_fails_at_open(spark, tmp_path):
    store = _store(spark, tmp_path, "meta", n_buckets=8)
    _feed(store, spark, [DOCS[:2]])
    PostingsIndexMaintenance(spark, str(tmp_path / "meta"), n_buckets=8)
    with pytest.raises(ValueError, match="term routing"):
        PostingsIndexMaintenance(spark, str(tmp_path / "meta"), n_buckets=16)
    with pytest.raises(ValueError, match="non-empty"):
        store.probe([])


def test_live_stream_maintains_index(spark, tmp_path):
    """readStream -> foreachBatch(store.wrap(sink)): search over the
    maintained index equals the reference over everything streamed."""
    src = str(tmp_path / "src")
    spark.createDataFrame(DOCS, SCHEMA).repartition(3).write.parquet(src)
    store = _store(spark, tmp_path, "live")
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(store.wrap(lambda df, bid: None))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _hits(store.bm25_topk(QUERY, k=5)) == _py_bm25(DOCS, QUERY, k=5)
