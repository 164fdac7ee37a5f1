"""Persisted postings (inverted-index) store: probe correctness, storage
partition pruning, and hot-term bucket spreading."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import postings as P
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table

from .conftest import SF_CORRECTNESS

QUERY = ["spark", "merge", "window"]
N_BUCKETS = 16


def _docs(spark):
    return load_table(spark, SF_CORRECTNESS, "documents")


def test_disk_probe_equals_direct_postings(spark, tmp_path):
    docs = _docs(spark)
    idx = P.build_postings_index(docs, n_buckets=N_BUCKETS)
    path = str(tmp_path / "postings")
    P.write_postings_index(idx, path)
    disk = P.read_postings_index(spark, path)

    buckets = P.probe_buckets(spark, QUERY, N_BUCKETS)
    got = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in P.probe_postings_index(disk, QUERY, buckets).collect()
    )
    want = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in idx.filter(F.col("term").isin(*QUERY))
        .select("term", "doc_id", "tf")
        .collect()
    )
    assert got == want and len(got) > 0


def test_probe_prunes_partitions_at_storage_level(spark, tmp_path):
    docs = _docs(spark)
    idx = P.build_postings_index(docs, n_buckets=N_BUCKETS)
    path = str(tmp_path / "postings")
    P.write_postings_index(idx, path)
    disk = P.read_postings_index(spark, path)

    buckets = P.probe_buckets(spark, QUERY, N_BUCKETS)
    probe = P.probe_postings_index(disk, QUERY, buckets)
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "tb" in pf and "IN" in pf, pf
    # the exact term predicate is PUSHED into the surviving buckets' scan
    assert "PushedFilters" in plan and "In(term" in plan
    # and the index genuinely spans more buckets than the probe admits
    all_buckets = {r["tb"] for r in disk.select("tb").distinct().collect()}
    assert len(all_buckets) > len(set(buckets))


def test_bucket_key_spreads_vocabulary(spark):
    # no vocabulary-scale directory: every bucket holds many distinct
    # terms, so a hot term can never concentrate the layout
    idx = P.build_postings_index(_docs(spark), n_buckets=N_BUCKETS)
    per_bucket = (
        idx.groupBy("tb")
        .agg(F.countDistinct("term").alias("n_terms"))
        .collect()
    )
    n_vocab = sum(r["n_terms"] for r in per_bucket)
    assert len(per_bucket) >= N_BUCKETS // 2
    # no single bucket concentrates the vocabulary
    assert max(r["n_terms"] for r in per_bucket) < n_vocab / 2


def test_tfidf_over_persisted_index_matches_registered_query(spark, tmp_path):
    """The registered tfidf_similar_docs result must be reproducible from
    the PERSISTED postings store — proving the store carries everything
    the retrieval family needs (tf per (doc, term); df/idf/norms derive
    from it)."""
    from pyspark.sql import functions as F

    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import (
        REGISTRY,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory_pipeline import (  # noqa: E501
        tfidf_topk_from_postings,
    )

    docs = _docs(spark)
    idx = P.build_postings_index(docs, n_buckets=N_BUCKETS)
    path = str(tmp_path / "postings")
    P.write_postings_index(idx, path)
    disk = P.read_postings_index(spark, path).select("doc_id", "term", "tf")
    stats = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))

    got = tfidf_topk_from_postings(disk, stats, query_doc=0, k=10).collect()
    want = REGISTRY["tfidf_similar_docs"].spark_fn(spark, SF_CORRECTNESS).collect()
    assert [(r["doc_id"], r["cos_sim"]) for r in got] == [
        (r["doc_id"], r["cos_sim"]) for r in want
    ]
