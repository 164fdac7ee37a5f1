"""Whole-surface shuffle- and scan-budget fence (plan_budgets.json).

test_plan_quality.py pins the SHAPE of ~50 hand-audited plans; this
fence covers breadth: every lazily-planned registry query has a
committed budget of exchanges / sort-merge joins / nested-loop joins /
parquet scans, and a refactor that silently adds a shuffle, degrades a
broadcast join to sort-merge, introduces a cartesian, or re-derives a
shared subtree into an extra table scan (Spark has no cross-subtree
CSE — the round-6 census found 11 such plans) ANYWHERE on the surface
fails here — the class of regression that is invisible to value checks
at sf0.01 and ruinous at 100 TB. When a plan legitimately changes,
regenerate the budget entry deliberately (the numbers are part of the
review diff, not incidental state)."""

from __future__ import annotations

import json
import os

import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY

from .conftest import SF_CORRECTNESS

_BUDGET_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plan_budgets.json",
)

with open(_BUDGET_FILE) as _fh:
    _BUDGETS: dict[str, dict[str, int]] = json.load(_fh)["budgets"]


def _counts(spark, name: str) -> dict[str, int]:
    df = REGISTRY[name].spark_fn(spark, SF_CORRECTNESS)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return {
        "exchanges": plan.count("Exchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "parquet_scans": plan.count("Scan parquet"),
    }


def test_budgeted_names_are_registered():
    missing = [n for n in _BUDGETS if n not in REGISTRY]
    assert not missing, f"budgeted queries no longer registered: {missing}"


def test_no_query_exceeds_its_plan_budget(spark):
    over: list[str] = []
    for name, budget in _BUDGETS.items():
        got = _counts(spark, name)
        for metric, cap in budget.items():
            if got[metric] > cap:
                over.append(f"{name}: {metric} {got[metric]} > budget {cap}")
    assert not over, (
        "plans regressed past their committed budgets (a new shuffle / "
        "join-strategy downgrade at 100 TB scale):\n  " + "\n  ".join(over)
    )
