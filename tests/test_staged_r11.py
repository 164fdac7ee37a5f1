"""Round-11 staged oracle candidate (plans/staged_r11.py): DuckDB
equivalence pinned at sf0.001 BEFORE registration day, plus the plan
shape the promotion will fence and the boundary-bucket precondition
the scale path's value rests on."""

from __future__ import annotations

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r11 import (
    _BUDGET_TOKENS,
    STAGED_R11,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


@pytest.mark.parametrize("name", sorted(STAGED_R11))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R11[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_column_names_match_oracle(spark, con):
    """The driver sorts columns BY NAME before hashing — a Spark/oracle
    name mismatch hash-fails even on equal values."""
    fn, sql = STAGED_R11["token_budget_corpus"]
    spark_cols = fn(spark, SF_DIR).columns
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert spark_cols == duck_cols == ["doc_id", "quality", "n_tokens"]


def test_selection_is_partial_and_boundary_lands_inside_a_bucket(con):
    """The staged budget must (a) keep a strict, non-empty subset — an
    all-kept or none-kept driver row would not exercise the cutoff —
    and (b) leave the boundary bucket PARTIALLY kept, so the green row
    proves the windowed boundary branch, not just the filter branch."""
    _, sql = STAGED_R11["token_budget_corpus"]
    kept = con.execute(sql).fetchall()
    total = con.execute("SELECT count(*) FROM documents").fetchall()[0][0]
    assert 0 < len(kept) < total
    kept_tokens = sum(r[2] for r in kept)
    assert kept_tokens <= _BUDGET_TOKENS
    # the NEXT doc in quality order did not fit => cutoff is real
    assert kept_tokens > _BUDGET_TOKENS - 100  # budget nearly exhausted


def test_staged_plan_shape(spark):
    """What the promotion will fence: one histogram aggregation + the
    two filter branches = three parquet scans, exactly one Window (the
    boundary bucket only), no join, no Python eval. The eager histogram
    pass runs at plan-build time (driver walk), so building the frame
    here also exercises that collect."""
    fn, _ = STAGED_R11["token_budget_corpus"]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2  # filter branch + window branch
    assert plan.count("Window") == 1
    for marker in ("BatchEvalPython", "ArrowEvalPython", "Join"):
        assert marker not in plan, plan
