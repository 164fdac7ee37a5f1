"""Bucketed layout kills the join shuffle: the co-located join's physical
plan must contain no Exchange (the write-time shuffle replaced it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8)
    write_bucketed(lineitem, "t_lineitem_b", "l_orderkey", 8)
    try:
        o = read_bucketed(spark, "t_orders_b")
        li = read_bucketed(spark, "t_lineitem_b")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderkey"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same result as the shuffled join over the raw tables
        raw = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, raw.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
