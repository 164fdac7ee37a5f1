"""applyInPandasWithState: state must carry across micro-batches, and the
final running totals must equal the batch ground truth."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.stateful import (
    running_user_stats,
)

from .conftest import SF_SMOKE

N_FILES = 3


def test_running_totals_accumulate_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "events")
    events = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    # several input files + maxFilesPerTrigger=1 => several micro-batches
    events.repartition(N_FILES).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM running_stats")
    truth = {
        r["user_id"]: (r["n"], r["total"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }

    # update mode emits one row per (user, batch-that-touched-it); totals are
    # monotone, so each user's final state is their row with max n_events.
    finals = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in emitted.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter("_rk = 1")
        .collect()
    }
    assert set(finals) == set(truth)
    for uid, (n, total) in truth.items():
        fn, ftotal = finals[uid]
        assert fn == n, uid
        assert math.isclose(ftotal, total, rel_tol=1e-9), uid

    # state actually crossed micro-batches: some user was emitted more than
    # once with growing counts
    multi = emitted.groupBy("user_id").count().filter("count > 1").count()
    assert multi > 0


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The Spark-4 transformWithStateInPandas form must produce the same
    final per-user totals as the applyInPandasWithState form and the
    batch ground truth, across several micro-batches.

    Environment gate: TWS runs a driver-side state server that speaks
    protobuf; this container ships pyspark without the protobuf package
    (and installs are off-limits), so the test self-skips where the
    runtime dependency is absent instead of failing on
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf for its "
        "driver-side state server; not shipped in this container",
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    src = str(tmp_path / "events")
    events = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    events.repartition(N_FILES).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("running_stats_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM running_stats_tws")
    truth = {
        r["user_id"]: (r["n"], r["total"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    finals = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in emitted.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter("_rk = 1")
        .collect()
    }
    assert set(finals) == set(truth)
    for uid, (n, total) in truth.items():
        fn, ftotal = finals[uid]
        assert fn == n, uid
        assert math.isclose(ftotal, total, rel_tol=1e-9), uid
    # state crossed micro-batches on this API too
    assert emitted.groupBy("user_id").count().filter("count > 1").count() > 0
