"""Session-cache equivalence for the shared dedup artifacts.

plans/inventory_ml keeps two materialized per-session artifacts — the
MinHash band index (consumed by minhash_lsh_near_dups AND
minhash_incremental_dedup) and the n-gram-Jaccard connected-components
assignment (consumed by dedup_clusters AND near_dedup_corpus_keep_first).
These tests pin that the cached paths return exactly what the uncached
operator compositions return (the cache may change WHEN work happens,
never WHAT comes back), and that the cache is actually hit in-session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import dedup as DD
from example_cdk_dynamodb_stream_to_redshift_spark.operators.components import (
    connected_components,
)
from example_cdk_dynamodb_stream_to_redshift_spark.plans import inventory_ml as ML
from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_band_index_cache_is_hit_and_stable(spark):
    a = ML._minhash_band_index_cached(spark, SF_SMOKE)
    b = ML._minhash_band_index_cached(spark, SF_SMOKE)
    assert a is b, "second lookup must return the cached frame"
    docs = load_table(spark, SF_SMOKE, "documents")
    fresh = DD.minhash_band_index(docs, num_hashes=16, bands=4, shingle_n=3)
    assert _rows(a) == _rows(fresh)


def test_lsh_near_dups_cached_path_matches_uncached_operator(spark):
    out = REGISTRY["minhash_lsh_near_dups"].spark_fn(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    direct = DD.minhash_lsh_near_dup_pairs(
        docs, num_hashes=16, bands=4, threshold=0.05
    )
    assert _rows(out) == _rows(direct.orderBy("id_a", "id_b"))


def test_incremental_dedup_index_slice_matches_batch_hashing(spark):
    out = REGISTRY["minhash_incremental_dedup"].spark_fn(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    direct = DD.incremental_near_dup_pairs(
        DD.minhash_band_index(corpus, num_hashes=16, bands=4),
        corpus,
        batch,
        num_hashes=16,
        bands=4,
        threshold=0.05,
    )
    assert _rows(out) == _rows(direct)


def test_cc_cache_matches_direct_components(spark):
    cached = ML._dedup_cc_cached(spark, SF_SMOKE)
    assert ML._dedup_cc_cached(spark, SF_SMOKE) is cached
    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, threshold=0.05)
    direct = connected_components(pairs, src="id_a", dst="id_b")
    assert _rows(cached) == _rows(direct)
