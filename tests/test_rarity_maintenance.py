"""Maintained shingle rarity (streaming/rarity_maintenance): the
store's docfreq/spectrum/uniqueness equal the batch operators over
everything landed, under fixed adversarial slicings (cross-batch
shared shingles, within-doc repeats, short/empty docs, idle batches),
one-big-batch vs many-small, replay, and compaction."""

from __future__ import annotations

from example_cdk_dynamodb_stream_to_redshift_spark.operators.rarity import (
    docfreq_spectrum,
    shingle_docfreq,
    uniqueness_profile,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.rarity_maintenance import (
    ShingleDocFreqStore,
)

SCHEMA = "doc_id long, text string"
N = 3

# doc 0/1 share "a b c" within batch 0; doc 4 shares it CROSS-batch;
# doc 2 has within-doc repeats; doc 3 is too short; doc 5 is empty
BATCHES = [
    [(0, "a b c d e"), (1, "a b c x y"), (2, "p q r p q r p q")],
    [],
    [(3, "one two"), (4, "z a b c w"), (5, "")],
]


def _landed(spark, k=len(BATCHES)):
    rows = [r for b in BATCHES[:k] for r in b]
    return spark.createDataFrame(rows, SCHEMA)


def _store(spark, tmp_path, name="rs"):
    return ShingleDocFreqStore(
        spark, str(tmp_path / name), "text", "doc_id", N
    )


def _feed(spark, store, k=len(BATCHES)):
    for i, b in enumerate(BATCHES[:k]):
        store.process_batch(spark.createDataFrame(b, SCHEMA), i)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _assert_store_equals_batch(spark, store, k=len(BATCHES)):
    corpus = _landed(spark, k)
    assert _rows(store.docfreq()) == _rows(
        shingle_docfreq(corpus, "text", "doc_id", N)
    )
    assert _rows(store.spectrum()) == _rows(
        docfreq_spectrum(corpus, "text", "doc_id", N)
    )
    assert _rows(store.uniqueness()) == _rows(
        uniqueness_profile(corpus, "text", "doc_id", N)
    )


def test_maintained_equals_batch_after_every_batch(spark, tmp_path):
    store = _store(spark, tmp_path)
    for i in range(len(BATCHES)):
        store.process_batch(
            spark.createDataFrame(BATCHES[i], SCHEMA), i
        )
        _assert_store_equals_batch(spark, store, i + 1)


def test_one_big_batch_agrees(spark, tmp_path):
    store = _store(spark, tmp_path, "one")
    store.process_batch(_landed(spark), 0)
    _assert_store_equals_batch(spark, store)


def test_replay_overwrites_itself(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store)
    last = len(BATCHES) - 1
    store.process_batch(spark.createDataFrame(BATCHES[last], SCHEMA), last)
    _assert_store_equals_batch(spark, store)


def test_compact_preserves_state(spark, tmp_path):
    store = _store(spark, tmp_path)
    _feed(spark, store)
    store.compact(keep_last=0)
    _assert_store_equals_batch(spark, store)
    # and the store keeps accepting batches after consolidation
    store.process_batch(
        spark.createDataFrame([(9, "a b c fresh tail")], SCHEMA), 9
    )
    corpus = _landed(spark).union(
        spark.createDataFrame([(9, "a b c fresh tail")], SCHEMA)
    )
    assert _rows(store.uniqueness()) == _rows(
        uniqueness_profile(corpus, "text", "doc_id", N)
    )


def test_cross_batch_uniqueness_flip(spark, tmp_path):
    """A shingle unique after batch 0 ("a b c" is df=2 there, but "c d
    e" is df=1) must lose uniqueness when a later batch repeats it."""
    store = ShingleDocFreqStore(spark, str(tmp_path / "flip"), n=3)
    store.process_batch(
        spark.createDataFrame([(1, "c d e x y")], SCHEMA), 0
    )
    u0 = {r["doc_id"]: r["n_unique"] for r in store.uniqueness().collect()}
    assert u0[1] == 3
    store.process_batch(
        spark.createDataFrame([(2, "c d e p q")], SCHEMA), 1
    )
    u1 = {r["doc_id"]: r["n_unique"] for r in store.uniqueness().collect()}
    assert u1[1] == 2 and u1[2] == 2  # "c d e" now shared


def test_doc_id_spanning_batches_fails_loudly(spark, tmp_path):
    """The store's correctness rests on 'a doc id never spans batches';
    a violating feed must surface as an error from uniqueness(), not
    double-counted df and duplicate per-doc rows."""
    import pytest

    store = ShingleDocFreqStore(spark, str(tmp_path / "span"), n=3)
    store.process_batch(spark.createDataFrame([(1, "a b c d")], SCHEMA), 0)
    store.process_batch(spark.createDataFrame([(1, "a b c e")], SCHEMA), 1)
    frame = store.uniqueness()  # lazy: the in-plan guard raises on execution
    with pytest.raises(Exception, match="spans"):
        frame.collect()
    # docfreq/spectrum stay readable (partials are still well-formed sums)
    assert store.docfreq().count() > 0
