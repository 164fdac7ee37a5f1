"""operators/topn.py: the two-phase salted top-n must be row-identical to
the single-window row_number oracle — including on hot-key-skewed input and
under ties with no unique tiebreaker in the ordering — and must refuse
inputs whose columns collide with its working columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from example_cdk_dynamodb_stream_to_redshift_spark.operators.topn import (
    top_n_per_key,
)


def _single_window_oracle(df, keys, order_cols, n, rank_col="rank"):
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 'hot' holds 5000 of 5600 rows; 3 cold keys share the rest.
    return spark.range(5600).select(
        F.when(F.col("id") < 5000, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), F.pmod("id", F.lit(3)).cast("string")))
        .alias("grp"),
        F.col("id").alias("row_id"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).cast("double").alias("score"),
    )


def test_matches_single_window_on_skew(spark, skewed):
    order = [F.desc("score"), F.asc("row_id")]
    got = top_n_per_key(skewed, ["grp"], order, 7, unique_key="row_id")
    want = _single_window_oracle(skewed, ["grp"], order, 7)
    cols = ["grp", "row_id", "score", "rank"]
    assert _rows(got, cols) == _rows(want, cols)


def test_ties_without_unique_tiebreaker(spark):
    # every row of a group shares one score: row_number under a non-total
    # ordering is nondeterministic PER ROW, but the (key, rank-multiset) and
    # the kept-row SET per (key, score) must match the window form's
    # guarantees: exactly n rows per key, all from the top score band.
    df = spark.range(400).select(
        F.pmod("id", F.lit(4)).cast("string").alias("grp"),
        F.col("id").alias("row_id"),
        # two-value ties, decorrelated from grp (= id % 4): score flips
        # every 4 ids, so each group is half 1.0 / half 0.0
        (F.floor(F.col("id") / 4) % 2).cast("double").alias("score"),
    )
    got = top_n_per_key(df, ["grp"], [F.desc("score")], 5, unique_key="row_id")
    per_key = got.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.min("score").alias("lo")
    )
    for r in per_key.collect():
        assert r["n"] == 5
        assert r["lo"] == 1.0  # all survivors from the top tie band (50/group)
    ranks = {tuple(r) for r in got.select("grp", "rank").collect()}
    assert ranks == {(g, i) for g in "0123" for i in range(1, 6)}


def test_n_larger_than_group(spark, skewed):
    order = [F.asc("score"), F.asc("row_id")]
    got = top_n_per_key(skewed, ["grp"], order, 500, unique_key="row_id")
    want = _single_window_oracle(skewed, ["grp"], order, 500)
    cols = ["grp", "row_id", "score", "rank"]
    assert _rows(got, cols) == _rows(want, cols)  # cold groups return whole


def test_custom_rank_col_and_salt_buckets(spark, skewed):
    order = [F.desc("score"), F.asc("row_id")]
    got = top_n_per_key(
        skewed, ["grp"], order, 3, unique_key="row_id",
        salt_buckets=1, rank_col="pos",
    )
    want = _single_window_oracle(skewed, ["grp"], order, 3, rank_col="pos")
    cols = ["grp", "row_id", "pos"]
    assert _rows(got, cols) == _rows(want, cols)


def test_rejects_column_collisions(spark, skewed):
    order = [F.desc("score")]
    for bad in ("_salt", "_local_rn", "rank"):
        df = skewed.withColumn(bad, F.lit(1))
        with pytest.raises(ValueError, match="collide"):
            top_n_per_key(df, ["grp"], order, 3, unique_key="row_id")
    # rank_col collision with a pre-existing column of that name
    df = skewed.withColumn("position", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        top_n_per_key(
            df, ["grp"], order, 3, unique_key="row_id", rank_col="position"
        )
