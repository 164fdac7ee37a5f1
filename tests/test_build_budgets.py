"""Build-cost fence for the eager/training registry queries the static
plan-budget file excludes (its note: "Eager/training/fixture-backed
queries are excluded — their builds run real jobs").

Those builds (ANN k-means trainings, BPE merge loops, classifier GD,
PageRank iterations, CDC fixture pipelines) ARE the expensive half of
the bench's end-to-end number, and a refactor that silently adds an
eager action — an extra count(), an un-shared training pass, a
per-iteration collect — is invisible to both the value checks and the
static plan fence. This fence caps, per query:

- ``build_jobs``: Spark jobs run while ``spark_fn`` CONSTRUCTS the
  result (read off the global DAG-scheduler job counter, so jobs from
  streaming/foreachBatch threads count too);
- the final (lazy) plan's exchanges / BNLJ / parquet scans, same
  counters as the static fence.

Budgets are CAPS measured on a COLD session (one fresh subprocess per
query — /tmp/gen_build_budgets.py pattern), so in-suite runs that hit
the session artifact caches (SCALE.md "Cross-query shared artifacts")
come in under them in any test order. Regenerate deliberately when a
build legitimately changes shape."""

from __future__ import annotations

import json
import os

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY

from .conftest import SF_CORRECTNESS

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

with open(os.path.join(_REPO, "build_budgets.json")) as _fh:
    _BUDGETS: dict[str, dict[str, int]] = json.load(_fh)["budgets"]

with open(os.path.join(_REPO, "plan_budgets.json")) as _fh:
    _STATIC: dict[str, dict[str, int]] = json.load(_fh)["budgets"]


def test_every_registry_query_is_fenced():
    """The two budget files must PARTITION the registry: every query is
    either in the static plan fence or in this build fence — a new
    registration cannot silently land in neither."""
    unfenced = [
        n for n in REGISTRY if n not in _STATIC and n not in _BUDGETS
    ]
    assert not unfenced, (
        f"registry queries in neither plan_budgets.json nor "
        f"build_budgets.json: {unfenced}"
    )
    double = [n for n in _BUDGETS if n in _STATIC]
    assert not double, f"queries in BOTH budget files: {double}"
    gone = [n for n in _BUDGETS if n not in REGISTRY]
    assert not gone, f"build-budgeted queries no longer registered: {gone}"


def test_no_build_exceeds_its_budget(spark):
    sc = spark.sparkContext
    next_job_id = lambda: sc._jsc.sc().dagScheduler().nextJobId()  # noqa: E731
    over: list[str] = []
    for name, budget in _BUDGETS.items():
        before = next_job_id()
        df = REGISTRY[name].spark_fn(spark, SF_CORRECTNESS)
        jobs = next_job_id() - before
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        got = {
            "build_jobs": jobs,
            "final_exchanges": plan.count("Exchange"),
            "final_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
            "final_parquet_scans": plan.count("Scan parquet"),
        }
        for metric, cap in budget.items():
            if got[metric] > cap:
                over.append(f"{name}: {metric} {got[metric]} > budget {cap}")
    assert not over, (
        "eager builds regressed past their committed budgets (an extra "
        "training pass / eager action / join-strategy downgrade that the "
        "static fence cannot see):\n  " + "\n  ".join(over)
    )
