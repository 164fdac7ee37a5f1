"""global_row_number (operators/ranking.py): exact parity with the
unpartitioned window, with no unpartitioned window in the plan."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.ranking import (
    global_row_number,
)


def _df(spark, n=500, seed=3):
    random.seed(seed)
    # heavy ties in the score column: the unique total order comes from id
    rows = [(i, random.randint(0, 20)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, score long")


def test_matches_unpartitioned_window(spark):
    df = _df(spark)
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(
            df, [F.col("score").desc(), F.col("id").asc()], num_partitions=8
        ).collect()
    }
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_no_unpartitioned_window_in_plan(spark):
    df = _df(spark, n=100)
    out = global_row_number(
        df, [F.col("score").asc(), F.col("id").asc()], num_partitions=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # ranks come from range partition + stamp
    assert "MapInPandas" in plan


def test_more_partitions_than_rows(spark):
    df = _df(spark, n=5)
    got = sorted(
        (r["rn"], r["id"])
        for r in global_row_number(
            df, [F.col("id").asc()], num_partitions=16
        ).collect()
    )
    assert [rn for rn, _ in got] == [1, 2, 3, 4, 5]


def test_recompute_is_stable(spark):
    df = _df(spark, n=300, seed=9)
    out = global_row_number(
        df, [F.col("score").desc(), F.col("id").asc()], num_partitions=8
    )
    a = sorted((r["id"], r["rn"]) for r in out.collect())
    b = sorted((r["id"], r["rn"]) for r in out.collect())  # cache is gone
    assert a == b


def test_permutation_at_scale(spark):
    """Regression (r4 advice): with .persist() + finally-unpersist the
    consumer's action recomputed the range shuffle, the RangePartitioner
    re-sampled boundaries under a fresh RDD-id-derived seed, and 400k
    rows produced ~10k duplicate ranks (max rank > n). localCheckpoint
    freezes the partitions the offsets were counted on; ranks must be an
    exact permutation of 1..n at a size where boundary re-sampling would
    actually drift."""
    n = 400_000
    df = spark.range(n).select(
        F.col("id"),
        (F.hash(F.col("id").cast("string")) % 1000).alias("score"),
    )
    out = global_row_number(
        df, [F.col("score").asc(), F.col("id").asc()], num_partitions=32
    )
    pdf = out.toPandas()  # consumer action AFTER the function returned
    rns = sorted(pdf["rn"].tolist())
    assert rns == list(range(1, n + 1))
    # spot-check global order correctness at the extremes
    by_rn = pdf.sort_values("rn")
    keys = list(zip(by_rn["score"].tolist(), by_rn["id"].tolist()))
    assert keys == sorted(keys)
