"""Stream-stream interval join and watermarked dedup == their batch forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.joins import (
    deduped,
    view_purchase_attribution,
)

from .conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # micros-precision re-materialization (raw fixture is TIMESTAMP(NANOS))
    path = str(tmp_path_factory.mktemp("events_ssj") / "events")
    load_table(spark, SF_SMOKE, "events").write.parquet(path)
    return path


@pytest.fixture(scope="module")
def dup_events_dir(spark, tmp_path_factory):
    # the same events written twice -> every row is an exact duplicate
    path = str(tmp_path_factory.mktemp("events_dup") / "events")
    ev = load_table(spark, SF_SMOKE, "events")
    ev.union(ev).repartition(4).write.parquet(path)
    return path


def _run_stream(spark, path, transform, name, mode="append"):
    batch_df = spark.read.parquet(path)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(path)
    q = (
        transform(stream_df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}"), transform(batch_df)


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    streamed, batch = _run_stream(
        spark, events_dir, view_purchase_attribution, "ssj_attr"
    )
    b = _sorted_rows(batch)
    assert len(b) > 0
    assert _sorted_rows(streamed) == b


def test_interval_join_bounds_matches(spark, events_dir):
    # every attributed purchase is within [view_ts, view_ts + 30 min]
    out = view_purchase_attribution(spark.read.parquet(events_dir)).select(
        (F.col("purchase_ts") >= F.col("view_ts")).alias("lo"),
        (
            F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 minutes")
        ).alias("hi"),
    )
    bad = out.filter(~F.col("lo") | ~F.col("hi")).count()
    assert bad == 0


def test_stream_dedup_within_watermark_equals_batch(spark, dup_events_dir):
    streamed, batch = _run_stream(
        spark,
        dup_events_dir,
        lambda df: deduped(df, ["event_id"]),
        "ssj_dedup",
    )
    n_batch = batch.count()
    assert n_batch > 0
    # doubled input collapses back to the distinct id count
    assert (
        spark.read.parquet(dup_events_dir).select("event_id").distinct().count()
        == n_batch
    )
    assert streamed.count() == n_batch
    # and the deduped key sets agree exactly
    assert _sorted_rows(streamed.select("event_id")) == _sorted_rows(
        batch.select("event_id")
    )


def test_batch_dedup_is_deterministic_keep_earliest(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0), "first"),
        (1, dt.datetime(2024, 1, 1, 11, 0, 0), "resend"),
        (2, dt.datetime(2024, 1, 2, 9, 0, 0), "only"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, payload string")
    # repeated runs over different partitionings pick the same (earliest) row
    for n in (1, 4, 16):
        out = {
            r.event_id: r.payload
            for r in deduped(df.repartition(n), ["event_id"]).collect()
        }
        assert out == {1: "first", 2: "only"}
