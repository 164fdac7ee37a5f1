"""finalize_merge_stats bounded-wait contract (ADVICE r3, medium).

``Observation.get`` blocks indefinitely until the observed plan completes an
action; if the merge's write failed or was skipped, the foreachBatch thread
would hang forever. finalize_merge_stats must instead resolve to
``deleted_count=None`` within its timeout, and must drop the unpicklable
``_obs_*`` JVM handles on every path.
"""

from __future__ import annotations

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.merge import (
    finalize_merge_stats,
)


def test_unattached_observations_resolve_immediately(spark):
    stats = {
        "_obs_target": Observation(),
        "_obs_survivors": Observation(),
        "staged_count": 1,
    }
    t0 = time.monotonic()
    out = finalize_merge_stats(stats, timeout_s=30.0)
    assert time.monotonic() - t0 < 5.0  # no wait: _jo is None, nothing to poll
    assert out["deleted_count"] is None
    assert "_obs_target" not in out and "_obs_survivors" not in out
    assert out["staged_count"] == 1


def test_observed_but_never_acted_times_out_not_hangs(spark):
    o1, o2 = Observation(), Observation()
    spark.range(10).observe(o1, F.count(F.lit(1)).alias("n"))
    spark.range(10).observe(o2, F.count(F.lit(1)).alias("n"))
    stats = {"_obs_target": o1, "_obs_survivors": o2}
    t0 = time.monotonic()
    out = finalize_merge_stats(stats, timeout_s=1.0)
    elapsed = time.monotonic() - t0
    assert out["deleted_count"] is None
    assert "_obs_target" not in out and "_obs_survivors" not in out
    assert elapsed < 15.0  # bounded (old behavior: forever)


def test_completed_actions_yield_exact_delta(spark):
    o1, o2 = Observation(), Observation()
    d1 = spark.range(7).observe(o1, F.count(F.lit(1)).alias("n"))
    d2 = spark.range(4).observe(o2, F.count(F.lit(1)).alias("n"))
    d1.count()
    d2.count()
    out = finalize_merge_stats({"_obs_target": o1, "_obs_survivors": o2})
    assert out["deleted_count"] == 3
