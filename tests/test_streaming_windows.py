"""Streaming windowed aggregation == batch windowed aggregation, and the
salted join == the plain join (semantics preserved under skew mitigation)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.skew import salted_join
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.windows import (
    windowed_sessions,
    windowed_stats,
)

from .conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # Re-materialize events at micros precision so readStream can consume it
    # (the raw fixture is TIMESTAMP(NANOS), handled only by load_table).
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, SF_SMOKE, "events").write.parquet(path)
    return path


def _run_stream(spark, events_dir, transform):
    batch_df = spark.read.parquet(events_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(events_dir)
    name = f"win_{abs(hash(events_dir + transform.__name__)) % 10**8}"
    q = (
        transform(stream_df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}"), transform(batch_df)


def test_stream_tumbling_equals_batch(spark, events_dir):
    streamed, batch = _run_stream(spark, events_dir, windowed_stats)
    assert _sorted_rows(streamed) == _sorted_rows(batch)
    assert len(_sorted_rows(batch)) > 0


def test_stream_sessions_equal_batch(spark, events_dir):
    streamed, batch = _run_stream(spark, events_dir, windowed_sessions)
    assert _sorted_rows(streamed) == _sorted_rows(batch)
    assert len(_sorted_rows(batch)) > 0


def test_salted_join_matches_plain_join(spark):
    # 90%-skewed fact: key 1 owns most rows.
    fact = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise((F.col("id") % 50).cast("long"))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 40).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    for how in ("inner", "left"):
        plain = fact.join(dim, "k", how)
        salted = salted_join(fact, dim, "k", salt_buckets=8, how=how)
        assert sorted(salted.columns) == sorted(plain.columns)
        assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_spreads_hot_key(spark):
    # worst case the salt must break: IDENTICAL rows of one hot key (a
    # content-derived salt would send them all to one bucket)
    fact = spark.range(0, 1000).select(F.lit(1).alias("k"), F.lit(0).alias("p"))
    dim = spark.range(0, 2).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    salted = salted_join(fact, dim, "k", salt_buckets=8)
    # position-derived salt fans identical rows over multiple buckets
    n_buckets = (
        fact.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets > 4
    assert salted.count() == 1000  # k=1 matches exactly one dim row


def test_salted_join_unique_key_path_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(200)], "rid int, k int, v string"
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, d string")
    plain = sorted((r.rid, r.k, r.v, r.d) for r in fact.join(dim, "k").collect())
    salted = sorted(
        (r.rid, r.k, r.v, r.d)
        for r in salted_join(fact, dim, "k", salt_buckets=8, unique_key="rid").collect()
    )
    assert salted == plain
