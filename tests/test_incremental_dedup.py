"""Incremental MinHash-index dedup: probing a PERSISTED band index gives
identical pairs to recomputing everything, only touched corpus docs are
re-read for verification, and span_dedup's reassembly semantics hold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import dedup as DD
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS


def _split(docs):
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    return corpus, batch


def test_persisted_index_round_trip(spark, tmp_path):
    """Write the corpus band index to parquet partitioned by band, read it
    back, probe with the batch — pairs must equal the all-in-memory run.
    This is the 100 TB steady state: the corpus is shingle-hashed ONCE at
    index-build time; every later crawl batch probes the stored table."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    corpus, batch = _split(docs)

    live_index = DD.minhash_band_index(corpus, num_hashes=16, bands=4)
    path = str(tmp_path / "band_index")
    live_index.write.partitionBy("band").parquet(path)
    stored_index = spark.read.parquet(path)

    def pairs(index):
        return sorted(
            (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
            for r in DD.incremental_near_dup_pairs(
                index, corpus, batch, num_hashes=16, bands=4, threshold=0.05
            ).collect()
        )

    live = pairs(live_index)
    stored = pairs(stored_index)
    assert stored == live
    assert len(live) > 0  # fixture corpus contains cross-split near-dups


def test_incremental_matches_full_lsh_pairs(spark):
    """Every incremental (batch, corpus) pair must appear in the full
    self-dedup pair set restricted to cross-split pairs — the incremental
    path loses nothing vs running minhash_lsh_near_dup_pairs over the
    union (same signatures, same band test, same verification)."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    corpus, batch = _split(docs)
    index = DD.minhash_band_index(corpus, num_hashes=16, bands=4)
    inc = {
        (r["batch_id"], r["corpus_id"])
        for r in DD.incremental_near_dup_pairs(
            index, corpus, batch, num_hashes=16, bands=4, threshold=0.05
        ).collect()
    }
    full = DD.minhash_lsh_near_dup_pairs(docs, num_hashes=16, bands=4,
                                         threshold=0.05).collect()
    cross = set()
    for r in full:
        a, b = r["id_a"], r["id_b"]
        if a % 10 == 7 and b % 10 != 7:
            cross.add((a, b))
        elif b % 10 == 7 and a % 10 != 7:
            cross.add((b, a))
    assert inc == cross


def test_probe_reads_only_candidate_corpus_docs(spark):
    """Scale invariant: verification's corpus-side shingle sets are built
    from candidate ids only (left-semi pruning), never the whole corpus.
    Asserted structurally: the optimized plan of the corpus-sets subtree
    contains a LeftSemi join before the aggregate."""
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    corpus, batch = _split(docs)
    index = DD.minhash_band_index(corpus, num_hashes=16, bands=4)
    out = DD.incremental_near_dup_pairs(
        index, corpus, batch, num_hashes=16, bands=4, threshold=0.05
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan


def test_span_dedup_reassembly_semantics(spark):
    """Hand-built corpus: doc 1 repeats doc 0's first span verbatim (plus
    its own tail); the repeat must vanish from doc 1 and survive in doc 0;
    a doc that is ENTIRELY earlier spans collapses to ''."""
    span = " ".join(f"w{i}" for i in range(10))  # one exact 10-word span
    tail = " ".join(f"t{i}" for i in range(10))
    rows = [
        (0, span + " " + tail),  # original: keeps both spans
        (1, span + " " + "u u u"),  # span repeated + unique short tail
        (2, span),  # entirely duplicated -> ''
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in DD.span_dedup(df, span_words=10).collect()}
    assert out[0]["clean_text"] == span + " " + tail
    assert out[0]["n_spans"] == 2 and out[0]["n_spans_kept"] == 2
    assert out[1]["clean_text"] == "u u u"
    assert out[1]["n_spans"] == 2 and out[1]["n_spans_kept"] == 1
    assert out[2]["clean_text"] == ""
    assert out[2]["n_spans"] == 1 and out[2]["n_spans_kept"] == 0


def test_span_dedup_string_ids(spark):
    """Regression (r4 advice): a string-keyed corpus must work — the old
    arithmetic order encoding (id * 1e8 + idx) silently NULLed out for
    string ids, dropping EVERY span. Struct ordering keeps first
    occurrence by lexicographic (id, span_idx)."""
    span = " ".join(f"w{i}" for i in range(10))
    tail = " ".join(f"t{i}" for i in range(10))
    rows = [
        ("doc-a", span + " " + tail),
        ("doc-b", span + " u u u"),
        ("doc-c", span),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in DD.span_dedup(df, span_words=10).collect()}
    assert out["doc-a"]["clean_text"] == span + " " + tail
    assert out["doc-b"]["clean_text"] == "u u u"
    assert out["doc-c"]["clean_text"] == ""
    assert out["doc-c"]["n_spans_kept"] == 0


def test_span_dedup_negative_ids(spark):
    """Negative ids order correctly under struct min: the globally-first
    occurrence belongs to the SMALLEST id, including negatives."""
    span = " ".join(f"w{i}" for i in range(10))
    rows = [(5, span), (-3, span)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in DD.span_dedup(df, span_words=10).collect()}
    assert out[-3]["n_spans_kept"] == 1 and out[-3]["clean_text"] == span
    assert out[5]["n_spans_kept"] == 0 and out[5]["clean_text"] == ""
