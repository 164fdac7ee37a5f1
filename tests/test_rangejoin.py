"""Binned range joins (operators/rangejoin.py): exact equivalence to the
naive cross-join + filter reference on random data (boundaries,
negatives, long intervals), one-row-per-pair with no DISTINCT in the
plan, and a hash/sort-merge join instead of BroadcastNestedLoopJoin."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


def _points(spark, rows):
    return spark.createDataFrame(rows, "p_id long, t long")


def _intervals(spark, rows):
    return spark.createDataFrame(rows, "iv_id long, s long, e long")


def _pairs(df, a="p_id", b="iv_id"):
    return sorted((r[a], r[b]) for r in df.select(a, b).collect())


def test_point_in_interval_matches_naive(spark):
    pts = _points(spark, [(i, t) for i, t in enumerate([-25, -10, 0, 3, 9, 10, 11, 57, 100])])
    ivs = _intervals(
        spark,
        [(0, -30, -10), (1, 0, 10), (2, 5, 5), (3, 8, 57), (4, 90, 200), (5, 40, 41)],
    )
    got = point_in_interval_join(pts, ivs, "t", "s", "e", bin_width=7)
    naive = pts.crossJoin(ivs).filter((F.col("s") <= F.col("t")) & (F.col("t") <= F.col("e")))
    assert _pairs(got) == _pairs(naive)
    # exclusive end variant
    got_ex = point_in_interval_join(
        pts, ivs, "t", "s", "e", bin_width=7, inclusive_end=False
    )
    naive_ex = pts.crossJoin(ivs).filter(
        (F.col("s") <= F.col("t")) & (F.col("t") < F.col("e"))
    )
    assert _pairs(got_ex) == _pairs(naive_ex)


def test_point_join_with_extra_equi_keys(spark):
    pts = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5), (3, "a", 20)], "p_id long, k string, t long"
    )
    ivs = spark.createDataFrame(
        [(10, "a", 0, 10), (11, "b", 0, 10), (12, "a", 15, 30)],
        "iv_id long, k string, s long, e long",
    )
    got = point_in_interval_join(pts, ivs, "t", "s", "e", bin_width=4, keys=["k"])
    assert _pairs(got) == [(1, 10), (2, 11), (3, 12)]


def test_interval_overlap_matches_naive_and_dedups_by_construction(spark):
    left = spark.createDataFrame(
        [(0, -20, -5), (1, 0, 100), (2, 30, 35), (3, 99, 99)],
        "l_id long, ls long, le long",
    )
    right = spark.createDataFrame(
        [(0, -6, 0), (1, 34, 60), (2, 101, 110), (3, -100, 200)],
        "r_id long, rs long, re long",
    )
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", bin_width=8)
    naive = left.crossJoin(right).filter(
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    assert _pairs(got, "l_id", "r_id") == _pairs(naive, "l_id", "r_id")
    # long intervals share MANY bins; each pair must still appear once
    pair_list = [r for r in got.select("l_id", "r_id").collect()]
    assert len(pair_list) == len(set((r["l_id"], r["r_id"]) for r in pair_list))


def test_plan_is_hash_join_not_nested_loop(spark):
    pts = _points(spark, [(0, 5)])
    ivs = _intervals(spark, [(0, 0, 10)])
    df = point_in_interval_join(pts, ivs, "t", "s", "e", bin_width=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    df2 = interval_overlap_join(
        _intervals(spark, [(0, 0, 10)]).toDF("l_id", "ls", "le"),
        _intervals(spark, [(0, 5, 15)]).toDF("r_id", "rs", "re"),
        "ls", "le", "rs", "re", bin_width=4,
    )
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan2 and "CartesianProduct" not in plan2
    # dedup is the first-shared-bin residual, never a distinct exchange
    assert "HashAggregate" not in plan2 or "distinct" not in plan2.lower()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=15),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=10,
    ),
    width=st.sampled_from([1, 3, 10, 64]),
)
def test_point_join_property_random(spark, pts, ivs, width):
    p = _points(spark, list(enumerate(pts)))
    iv = _intervals(spark, [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)])
    got = point_in_interval_join(p, iv, "t", "s", "e", bin_width=width)
    naive = p.crossJoin(iv).filter((F.col("s") <= F.col("t")) & (F.col("t") <= F.col("e")))
    assert _pairs(got) == _pairs(naive)


def test_nonpositive_bin_width_is_loud(spark):
    import pytest

    pts = _points(spark, [(0, 5)])
    ivs = _intervals(spark, [(0, 0, 10)])
    for w in (0, -4):
        with pytest.raises(ValueError, match="bin_width"):
            point_in_interval_join(pts, ivs, "t", "s", "e", bin_width=w)
        with pytest.raises(ValueError, match="bin_width"):
            interval_overlap_join(
                ivs.toDF("l_id", "ls", "le"),
                ivs.toDF("r_id", "rs", "re"),
                "ls", "le", "rs", "re", bin_width=w,
            )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ls=st.lists(
        st.tuples(st.integers(min_value=-40, max_value=40), st.integers(min_value=0, max_value=30)),
        min_size=1, max_size=8,
    ),
    rs=st.lists(
        st.tuples(st.integers(min_value=-40, max_value=40), st.integers(min_value=0, max_value=30)),
        min_size=1, max_size=8,
    ),
    width=st.sampled_from([1, 5, 17]),
)
def test_overlap_join_property_random(spark, ls, rs, width):
    left = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(ls)], "l_id long, ls long, le long"
    )
    right = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(rs)], "r_id long, rs long, re long"
    )
    got = interval_overlap_join(left, right, "ls", "le", "rs", "re", bin_width=width)
    naive = left.crossJoin(right).filter(
        (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    )
    assert _pairs(got, "l_id", "r_id") == _pairs(naive, "l_id", "r_id")


def test_reversed_interval_contributes_zero_matches_not_a_crash(spark):
    """A malformed interval with end < start is an EMPTY closed interval:
    it must contribute zero pairs — sequence() with an explicit positive
    step would otherwise raise on the descending boundaries and kill the
    whole job over one corrupt row (r8 review finding)."""
    pts = _points(spark, [(1, 5), (2, 15)])
    ivs = _intervals(spark, [(10, 0, 20), (11, 20, 0), (12, 7, 3)])
    got = _pairs(
        point_in_interval_join(pts, ivs, "t", "s", "e", bin_width=4)
    )
    assert got == [(1, 10), (2, 10)]  # only the well-formed interval

    left = ivs.selectExpr("iv_id AS l_id", "s AS l_s", "e AS l_e")
    right = spark.createDataFrame(
        [(20, 0, 100), (21, 50, 40)], "r_id long, r_s long, r_e long"
    )
    overlaps = _pairs(
        interval_overlap_join(
            left, right, "l_s", "l_e", "r_s", "r_e", bin_width=16
        ),
        a="l_id",
        b="r_id",
    )
    # reversed intervals on EITHER side are empty: only (10, 20) overlap
    assert overlaps == [(10, 20)]
