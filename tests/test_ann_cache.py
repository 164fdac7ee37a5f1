"""Session-cache equivalence for the shared ANN training artifacts
(plans/inventory_ml: _ivf_index_cached, _pq_codebooks_cached): the cached
quantizer/codebooks must equal fresh deterministic training, and the
consumer queries must return what the uncached compositions return."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import pq as PQ
from example_cdk_dynamodb_stream_to_redshift_spark.operators import similarity as SIM
from example_cdk_dynamodb_stream_to_redshift_spark.plans import inventory_ml as ML
from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_ivf_cache_matches_fresh_training(spark):
    c1, idx1 = ML._ivf_index_cached(spark, SF_SMOKE)
    c2, idx2 = ML._ivf_index_cached(spark, SF_SMOKE)
    assert c1 is c2 and idx1 is idx2, "second lookup must hit the cache"
    emb = load_table(spark, SF_SMOKE, "embeddings")
    fresh = SIM.train_ivf_centroids(emb, n_centroids=8, iters=3)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(fresh))
    fresh_idx = SIM.build_ivf_index(emb, fresh)
    assert sorted(map(tuple, idx1.collect())) == sorted(
        map(tuple, fresh_idx.collect())
    )


def test_pq_codebook_cache_matches_fresh_training(spark):
    b1 = ML._pq_codebooks_cached(spark, SF_SMOKE)
    assert ML._pq_codebooks_cached(spark, SF_SMOKE) is b1
    emb = load_table(spark, SF_SMOKE, "embeddings")
    fresh = PQ.train_pq_codebooks(emb, m=8, n_centroids=16, iters=2, dim=64)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(fresh))


def test_fullprobe_query_still_equals_brute_force(spark):
    """ivf_ann_fullprobe_topk's exactness is independent of WHERE the
    centroids came from — re-check the degenerate-config guarantee
    through the cached path."""
    got = REGISTRY["ivf_ann_fullprobe_topk"].spark_fn(spark, SF_SMOKE)
    brute = REGISTRY["ann_bruteforce_topk"].spark_fn(spark, SF_SMOKE)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in brute.collect()]


def test_ivf_knn_join_consumers_share_one_index(spark):
    before = len(ML._ivf_index_cache)
    REGISTRY["ivf_knn_join_topk"].spark_fn(spark, SF_SMOKE).collect()
    REGISTRY["ivf_knn_join_fullprobe"].spark_fn(spark, SF_SMOKE).collect()
    after = len(ML._ivf_index_cache)
    assert after - before <= 1, "both consumers must share one artifact entry"


def test_ivfpq_consumes_centroids_without_building_the_ivf_index(spark, tmp_path):
    """ivfpq builds its own composite index; asking for the shared
    centroids must not materialize the plain IVF inverted-list table."""
    # a distinct sf_dir key so this test observes its own cache entries
    import shutil as _sh

    sf = str(tmp_path / "sf")
    _sh.copytree(SF_SMOKE, sf)
    assert (spark, sf) not in ML._ivf_index_cache
    REGISTRY["ivfpq_ann_topk"].spark_fn(spark, sf).collect()
    assert (spark, sf) in ML._ivf_centroid_cache
    assert (spark, sf) not in ML._ivf_index_cache
