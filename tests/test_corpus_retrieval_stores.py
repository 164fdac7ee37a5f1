"""CorpusIngestPipeline + attached maintained retrieval stores (the r12
verdict's composition item): a corpus ingested through the pipeline stays
BM25-searchable and ANN-probeable with no separate drive loop.

Pins: ingest-then-search equals index-all-landed-then-search for both
stores; only LANDED docs are indexed (decontam drops, exact dups, and
cross-batch dups never become searchable); compaction rides the
pipeline's maintenance cadence without changing answers; misconfigured
store key columns fail at pipeline construction."""

from __future__ import annotations

import json
import os

from example_cdk_dynamodb_stream_to_redshift_spark.streaming.ann_maintenance import (
    IvfIndexMaintenance,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.corpus import (
    CorpusIngestPipeline,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.postings_maintenance import (
    PostingsIndexMaintenance,
)

import pytest

CENTROIDS = [
    [10.0, 0.0, 0.0, 0.0],
    [0.0, 10.0, 0.0, 0.0],
    [0.0, 0.0, 10.0, 0.0],
]

LEAK = "the quick brown fox jumps over the lazy dog"

# (doc_id, text, embedding) — doc 2 is a decontam leak, doc 4 duplicates
# doc 1's text within the batch, doc 6 re-sends doc 3's text cross-batch
B1 = [
    (1, "spark lands parquet rows in tables", [9.0, 1.0, 0.5, 0.25]),
    (2, LEAK, [0.5, 9.5, 0.0, 0.5]),
    (3, "bm25 ranks documents by term frequency", [0.0, 9.0, 1.0, 0.75]),
    (4, "spark lands parquet rows in tables", [1.0, 0.5, 9.0, 0.0]),
]
B2 = [
    (6, "bm25 ranks documents by term frequency", [9.5, 0.5, 0.5, 0.5]),
    (7, "another document about ranking terms", [0.5, 0.5, 9.5, 1.0]),
    (8, "parquet compaction keeps scans fast", [0.25, 9.0, 0.5, 0.25]),
]
LANDED_IDS = {1, 3, 7, 8}  # 2 decontaminated, 4 within-batch dup, 6 cross-batch dup
QUERY = ["parquet", "ranking", "documents"]


def _write_docs(path: str, docs) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for i, t, vec in docs:
            fh.write(
                json.dumps(
                    {
                        "doc_id": i,
                        "text": t,
                        "lang": "en",
                        "source": "web",
                        "embedding": vec,
                    }
                )
                + "\n"
            )


def _pipe(spark, tmp_path):
    heldout = spark.createDataFrame(
        [(100, LEAK)], "doc_id long, text string"
    )
    postings = PostingsIndexMaintenance(
        spark, str(tmp_path / "pidx"), n_buckets=8
    )
    ann = IvfIndexMaintenance(
        spark,
        str(tmp_path / "aidx"),
        CENTROIDS,
        id_col="doc_id",
        vec_col="embedding",
    )
    pipe = CorpusIngestPipeline(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "wh"),
        decontam_docs=heldout,
        decontam_n=4,
        decontam_max_hits=0,
        postings_store=postings,
        ann_store=ann,
    )
    return pipe, postings, ann


def _bm25_rows(store, k=5):
    return [(r["doc_id"], r["bm25"]) for r in store.bm25_topk(QUERY, k=k).collect()]


def _ann_rows(store, q, k=3):
    # nprobe=K degrades to exact brute force — the parity end of the dial
    return [
        (r["id"], round(r["cos_sim"], 9))
        for r in store.search(q, k=k, nprobe=len(CENTROIDS)).collect()
    ]


def test_ingested_corpus_stays_searchable(spark, tmp_path):
    pipe, postings, ann = _pipe(spark, tmp_path)
    _write_docs(os.path.join(pipe.input_path, "b1.json"), B1)
    pipe.refresh()
    _write_docs(os.path.join(pipe.input_path, "b2.json"), B2)
    pipe.refresh()

    landed = {r["doc_id"] for r in pipe.corpus().collect()}
    assert landed == LANDED_IDS
    # the landed corpus kept the embedding column for the ANN store
    assert "embedding" in pipe.corpus().columns

    # exactly the landed docs are searchable — drops and dup copies never
    # reached either store
    assert {r["doc_id"] for r in postings.doc_stats().collect()} == {
        str(i) for i in LANDED_IDS
    }
    assert {r["id"] for r in ann.index().collect()} == {
        str(i) for i in LANDED_IDS
    }

    # ingest-then-search == index-all-landed-then-search, both stores
    ref_p = PostingsIndexMaintenance(
        spark, str(tmp_path / "refp"), n_buckets=8
    )
    ref_a = IvfIndexMaintenance(
        spark,
        str(tmp_path / "refa"),
        CENTROIDS,
        id_col="doc_id",
        vec_col="embedding",
    )
    all_landed = pipe.corpus()
    ref_p.process_batch(all_landed, 0)
    ref_a.process_batch(all_landed, 0)
    assert _bm25_rows(postings) == _bm25_rows(ref_p)
    q = [9.0, 0.5, 0.5, 0.5]
    assert _ann_rows(ann, q) == _ann_rows(ref_a, q)

    # compaction rides the pipeline cadence (keep_last=0: quiescent) and
    # changes no answers
    before_p, before_a = _bm25_rows(postings), _ann_rows(ann, q)
    pipe.compact(keep_last=0)
    assert _bm25_rows(postings) == before_p
    assert _ann_rows(ann, q) == before_a


def test_replayed_batch_keeps_stores_consistent(spark, tmp_path):
    """An at-least-once replay of a landed batch re-runs the whole
    composition (dedup read-back -> store process_batch) and must change
    neither corpus nor search answers."""
    pipe, postings, ann = _pipe(spark, tmp_path)
    _write_docs(os.path.join(pipe.input_path, "b1.json"), B1)
    pipe.refresh()
    want_p = _bm25_rows(postings)
    q = [9.0, 0.5, 0.5, 0.5]
    want_a = _ann_rows(ann, q)
    # replay batch 0 by hand through the foreachBatch body
    batch = spark.read.schema(pipe.stream_schema).json(
        os.path.join(pipe.input_path, "b1.json")
    )
    pipe._ingest_batch(batch, 0)
    assert {r["doc_id"] for r in pipe.corpus().collect()} == {1, 3}
    assert _bm25_rows(postings) == want_p
    assert _ann_rows(ann, q) == want_a


def test_misconfigured_store_keys_fail_at_construction(spark, tmp_path):
    with pytest.raises(ValueError, match="postings_store"):
        CorpusIngestPipeline(
            spark,
            str(tmp_path / "in"),
            str(tmp_path / "wh"),
            postings_store=PostingsIndexMaintenance(
                spark, str(tmp_path / "p2"), id_col="vec_id"
            ),
        )
    with pytest.raises(ValueError, match="ann_store"):
        CorpusIngestPipeline(
            spark,
            str(tmp_path / "in"),
            str(tmp_path / "wh"),
            ann_store=IvfIndexMaintenance(
                spark, str(tmp_path / "a2"), CENTROIDS
            ),
        )
