"""Token-budget corpus selection (operators/selection.py): the scale
path (histogram -> boundary walk -> filter + boundary-only window) is
pinned bit-equal to the semantic definition (one global window cumsum)
and to a pure-Python reference, across fixed edge cases and randomized
hypothesis inputs. Pytest-pinned only this round — round 9 holds the
oracle registration freeze; the driver-facing form is staged in
plans/staged_r11.py."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.selection import (
    budget_select,
    budget_select_exact,
    uniform_edges,
)

EDGES = uniform_edges(8)  # coarse on purpose: boundary bucket is busy


def _df(spark, rows):
    """rows: (doc_id, score, weight) with None allowed in score/weight."""
    return spark.createDataFrame(
        rows, "doc_id long, score double, w long"
    )


def _py_reference(rows, budget):
    """The contract, independently restated: sort eligible by
    (score desc, doc_id asc), keep while running weight <= budget."""
    elig = [
        r
        for r in rows
        if r[1] is not None and not math.isnan(r[1]) and r[2] is not None
    ]
    elig.sort(key=lambda r: (-r[1], r[0]))
    kept, acc = [], 0
    for doc_id, score, w in elig:
        acc += w
        if acc <= budget:
            kept.append(doc_id)
    return sorted(kept)


def _kept(df):
    return sorted(r["doc_id"] for r in df.collect())


FIXED = [
    (0, 0.95, 40),
    (1, 0.95, 10),   # tie with doc 0 -> doc_id tiebreak
    (2, 0.80, 30),
    (3, 0.70, 25),
    (4, 0.70, 0),    # zero weight rides free if reached
    (5, 0.10, 5),
    (6, None, 1),    # null score: excluded
    (7, float("nan"), 1),  # NaN score: excluded, must not win the budget
    (8, 0.60, None),  # null weight: excluded
]


def test_fixed_case_matches_reference_and_exact(spark):
    df = _df(spark, FIXED)
    for budget in (-7, 0, 5, 50, 79, 80, 81, 105, 110, 10_000):
        want = _py_reference(FIXED, budget)
        got_exact = _kept(
            budget_select_exact(df, "score", "w", budget, "doc_id")
        )
        got_scale = _kept(
            budget_select(df, "score", "w", budget, "doc_id", EDGES)
        )
        assert got_exact == want, budget
        assert got_scale == want, budget


def test_oversize_first_doc_blocks_the_prefix(spark):
    """Prefix semantics, not knapsack: if the best doc alone exceeds
    the budget, nothing is kept — both paths."""
    rows = [(0, 0.9, 100), (1, 0.5, 1)]
    df = _df(spark, rows)
    assert _kept(budget_select_exact(df, "score", "w", 50, "doc_id")) == []
    assert _kept(budget_select(df, "score", "w", 50, "doc_id", EDGES)) == []


def test_all_fit_returns_every_eligible_row(spark):
    df = _df(spark, FIXED)
    want = _py_reference(FIXED, 10_000)
    assert _kept(budget_select(df, "score", "w", 10_000, "doc_id", EDGES)) == want
    # schema identical between paths even on the all-fit shortcut
    a = budget_select(df, "score", "w", 10_000, "doc_id", EDGES)
    b = budget_select_exact(df, "score", "w", 10_000, "doc_id")
    assert a.columns == b.columns == ["doc_id", "score", "w"]


def test_empty_input(spark):
    df = _df(spark, []).filter("doc_id IS NOT NULL")
    assert _kept(budget_select(df, "score", "w", 10, "doc_id", EDGES)) == []


@given(
    data=st.lists(
        st.tuples(
            st.floats(
                min_value=0.0, max_value=1.0, allow_nan=False, width=64
            ),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0,
        max_size=40,
    ),
    budget=st.integers(min_value=0, max_value=400),
    bins=st.integers(min_value=1, max_value=12),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scale_path_equals_exact_on_random_inputs(spark, data, budget, bins):
    rows = [(i, s, w) for i, (s, w) in enumerate(data)]
    # duplicate scores are likely at these sizes via hypothesis shrink;
    # force a few exact ties to exercise the tiebreak deterministically
    if len(rows) >= 4:
        rows[1] = (rows[1][0], rows[0][1], rows[1][2])
        rows[3] = (rows[3][0], rows[2][1], rows[3][2])
    df = _df(spark, rows)
    edges = uniform_edges(bins)
    want = _py_reference(rows, budget)
    assert _kept(budget_select_exact(df, "score", "w", budget, "doc_id")) == want
    assert _kept(budget_select(df, "score", "w", budget, "doc_id", edges)) == want


def test_scale_plan_sorts_only_bounded_partitions(spark):
    """The point of the scale path, asserted on the plan: exactly TWO
    Windows — the bins-sized boundary locator (planned ONCE: the r13
    single-reference tail replaced the two-branch union whose column
    pruning specialized the control subtree into two executed copies)
    plus the bucket-PARTITIONED survivor cumsum, whose largest
    partition is one bucket, never the corpus total order. The one-row
    control frame reaches the corpus via a single broadcast join and
    the corpus is scanned exactly twice (histogram + survivors). Node
    text is matched by condition patterns, not by formatted-plan node
    numbers (those shift across Spark versions)."""
    import re

    rows = [(i, (i % 97) / 97.0, 10) for i in range(300)]
    df = _df(spark, rows)
    out = budget_select(df, "score", "w", 200, "doc_id", EDGES)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # Two windows: boundary locator (once) + bucket-partitioned cumsum.
    assert plan.count(") Window") == 2
    # The survivor window is partitioned by the bucket working column —
    # never an empty partition spec over the corpus.
    assert re.search(
        r"partitionspec.*__budget_bucket__", plan, re.IGNORECASE | re.DOTALL
    ) or "PartitionBy" in plan or "__budget_bucket__" in plan
    # sub-boundary rows are cut by the >= comparison against the
    # broadcast boundary scalar riding the one-row join
    assert ">= __budget_boundary__" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan  # the corpus never key-shuffles
    # the source is scanned exactly twice (histogram + survivors); the
    # old union shape re-scanned it under each branch (four scans on a
    # parquet source; an ExistingRDD here). Formatted mode names each
    # node twice (tree + detail), so count tree nodes only.
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) == 2


def test_negative_weight_raises_at_action_time(spark):
    """Non-negative weights are the precondition of the monotone-prefix
    argument; a violation must raise, not silently misplace the
    boundary. The check rides the broadcast control row."""
    df = _df(spark, [(0, 0.9, 10), (1, 0.5, -3)])
    out = budget_select(df, "score", "w", 15, "doc_id", EDGES)
    with pytest.raises(Exception, match="non-negative"):
        out.collect()


def test_fractional_weight_type_raises_at_plan_time(spark):
    """ADVICE r9: a double weight column used to be silently cast to
    long, selecting against floor(weight) — consistently across both
    Spark paths, so no equality test could catch the divergence from
    the documented cum-sum-of-weight semantics. All three entry points
    now reject non-integral weight types before any job runs."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.selection import (
        weight_histogram,
    )

    df = spark.createDataFrame(
        [(0, 0.9, 1.5), (1, 0.5, 2.5)], "doc_id long, score double, w double"
    )
    with pytest.raises(TypeError, match="integral"):
        budget_select(df, "score", "w", 15, "doc_id", EDGES)
    with pytest.raises(TypeError, match="integral"):
        budget_select_exact(df, "score", "w", 15, "doc_id")
    with pytest.raises(TypeError, match="integral"):
        weight_histogram(df, "score", "w", EDGES)
    # decimal with scale 0 is integral and stays accepted
    dec = df.withColumn("w", F.col("w").cast("decimal(10,0)"))
    assert budget_select(dec, "score", "w", 15, "doc_id", EDGES).count() == 2


def test_working_column_name_is_collision_proof(spark):
    """A caller frame that already carries __budget_cum__ (e.g. from an
    earlier selection pass it kept) must survive both paths untouched."""
    df = _df(spark, [(0, 0.9, 10), (1, 0.5, 20)]).withColumn(
        "__budget_cum__", F.lit(99)
    )
    for out in (
        budget_select_exact(df, "score", "w", 15, "doc_id"),
        budget_select(df, "score", "w", 15, "doc_id", EDGES),
    ):
        rows = out.collect()
        assert [r["doc_id"] for r in rows] == [0]
        assert rows[0]["__budget_cum__"] == 99


def test_uniform_edges_shape():
    e = uniform_edges(3)
    assert e == (0.25, 0.5, 0.75)
    assert uniform_edges(1) == (0.5,)
