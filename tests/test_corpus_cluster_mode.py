"""CorpusIngestPipeline near_dedup="cluster": near-dups are KEPT, the
maintained cluster assignment equals the batch pipeline (full-corpus
LSH pairs -> connected components) after every refresh, cross-batch
merges propagate, canonical_corpus applies the min-id convention,
replay is idempotent, and the mode flag is validated."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.components import (
    connected_components,
)
from example_cdk_dynamodb_stream_to_redshift_spark.operators.dedup import (
    minhash_lsh_near_dup_pairs,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.corpus import (
    CorpusIngestPipeline,
)

BASE = "the quick brown fox jumps over the lazy dog before breakfast today"

# near-dup variants change only an EDGE word (first/last), touching a
# single 3-gram shingle: Jaccard ~0.75-0.82, far above the 0.5
# threshold and comfortably inside the 16-hash/8-band LSH recall (the
# hash family is seeded, so recall is deterministic per fixture)
B1 = [
    (1, BASE),
    (2, BASE.replace("today", "tonight")),             # ~ doc 1
    (3, "completely different text about spark engines and parquet files"),
    (4, "unrelated singleton content nothing matches this at all here"),
]
B2 = [
    (5, BASE.replace("the quick", "a quick")),         # ~ doc 1 (cross-batch)
    (6, "completely different text about spark engines and parquet rows"),
    # ~ doc 3 (cross-batch: only the last word differs)
    (7, "utterly different text about spark engines and parquet rows"),
    # ~ doc 6 (within batch: only the first word differs) -> chain 3-6-7
]


def _write_docs(path: str, docs: list[tuple[int, str]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for doc_id, text in docs:
            fh.write(
                json.dumps(
                    {"doc_id": doc_id, "text": text, "lang": "en", "source": "s"}
                )
                + "\n"
            )


def _pipe(spark, tmp_path):
    return CorpusIngestPipeline(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "wh"),
        near_dedup="cluster",
        bands=8,
        jaccard_threshold=0.5,
    )


def _batch_truth(spark, pipe):
    """The from-scratch pipeline over the landed corpus: full LSH pair
    generation (same params) + connected components + singletons."""
    corpus = pipe.corpus()
    pairs = minhash_lsh_near_dup_pairs(
        corpus,
        num_hashes=pipe.num_hashes,
        bands=pipe.bands,
        threshold=pipe.jaccard_threshold,
    )
    comp = connected_components(pairs, "id_a", "id_b")
    assigned = {r["node"]: r["component"] for r in comp.collect()}
    return {
        r["doc_id"]: assigned.get(r["doc_id"], r["doc_id"])
        for r in corpus.collect()
    }


def _maintained(pipe):
    corpus_ids = {r["doc_id"] for r in pipe.corpus().collect()}
    got = {r["node"]: r["component"] for r in pipe.clusters().collect()}
    return {i: got.get(i, i) for i in corpus_ids}


def test_cluster_mode_keeps_neardups_and_matches_batch_closure(
    spark, tmp_path
):
    pipe = _pipe(spark, tmp_path)
    _write_docs(str(tmp_path / "in" / "b1.json"), B1)
    pipe.refresh()
    assert {r["doc_id"] for r in pipe.corpus().collect()} == {1, 2, 3, 4}
    assert _maintained(pipe) == _batch_truth(spark, pipe)

    _write_docs(str(tmp_path / "in" / "b2.json"), B2)
    pipe.refresh()
    # near-dups KEPT (drop mode would suppress 5, 6, 7)
    assert {r["doc_id"] for r in pipe.corpus().collect()} == set(range(1, 8))
    truth = _batch_truth(spark, pipe)
    assert _maintained(pipe) == truth
    # the fixture genuinely exercises cross-batch merging: 5 joined 1's
    # cluster, and the 3-6-7 chain merged across the batch boundary
    assert truth[5] == 1 and truth[6] == 3 and truth[7] == 3
    assert truth[4] == 4  # singleton stays its own component


def test_canonical_corpus_keeps_min_id_per_cluster(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    _write_docs(str(tmp_path / "in" / "b1.json"), B1)
    pipe.refresh()
    _write_docs(str(tmp_path / "in" / "b2.json"), B2)
    pipe.refresh()
    truth = _batch_truth(spark, pipe)
    want = {i for i, c in truth.items() if c == i}
    got = {r["doc_id"] for r in pipe.canonical_corpus().collect()}
    assert got == want == {1, 3, 4}


def test_cluster_mode_replay_is_idempotent(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    _write_docs(str(tmp_path / "in" / "b1.json"), B1)
    pipe.refresh()
    _write_docs(str(tmp_path / "in" / "b2.json"), B2)
    pipe.refresh()
    before = _maintained(pipe)
    # simulate an at-least-once retry of the LAST micro-batch
    replay = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in B2],
        "doc_id long, text string, lang string, source string",
    )
    pipe._ingest_batch(replay, 1)
    assert _maintained(pipe) == before
    rows = pipe.clusters().collect()
    assert len(rows) == len({r["node"] for r in rows})


def test_compact_folds_cluster_store_and_preserves_state(spark, tmp_path):
    pipe = _pipe(spark, tmp_path)
    _write_docs(str(tmp_path / "in" / "b1.json"), B1)
    pipe.refresh()
    _write_docs(str(tmp_path / "in" / "b2.json"), B2)
    pipe.refresh()
    before = _maintained(pipe)
    pipe.compact()
    assert _maintained(pipe) == before
    assert {r["doc_id"] for r in pipe.canonical_corpus().collect()} == {1, 3, 4}


def test_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="near_dedup"):
        CorpusIngestPipeline(
            spark, str(tmp_path / "in"), str(tmp_path / "wh"), near_dedup="both"
        )
    exact = CorpusIngestPipeline(
        spark, str(tmp_path / "in"), str(tmp_path / "wh2")
    )
    with pytest.raises(ValueError, match="cluster"):
        exact.clusters()
    with pytest.raises(ValueError, match="cluster"):
        exact.canonical_corpus()
