"""Round-11 staged oracle candidate (plans/staged_r11.py): DuckDB
equivalence pinned at sf0.001 BEFORE registration day, plus the plan
shape the promotion will fence and the boundary-bucket precondition
the scale path's value rests on."""

from __future__ import annotations

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r11 import (
    _BUDGET_TOKENS,
    _EDGES,
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
    proves the windowed boundary branch, not just the filter branch
    (a cutoff coinciding exactly with a bucket edge would silently stop
    exercising the window — fence it here, not on registration day)."""
    from bisect import bisect_right

    _, sql = STAGED_R11["token_budget_corpus"]
    kept = con.execute(sql).fetchall()
    total = con.execute("SELECT count(*) FROM documents").fetchall()[0][0]
    assert 0 < len(kept) < total
    kept_tokens = sum(r[2] for r in kept)
    assert kept_tokens <= _BUDGET_TOKENS
    # the NEXT doc in quality order did not fit => cutoff is real
    assert kept_tokens > _BUDGET_TOKENS - 100  # budget nearly exhausted
    # boundary bucket = the lowest bucket among kept rows; it must also
    # contain UNKEPT eligible rows, or the window branch kept nothing
    buckets = [bisect_right(list(_EDGES), r[1]) for r in kept]
    b_min = min(buckets)
    kept_in_boundary = sum(1 for b in buckets if b == b_min)
    conds = ["TRUE"]
    if b_min > 0:
        conds.append(f"quality >= {_EDGES[b_min - 1]!r}")
    if b_min < len(_EDGES):
        conds.append(f"quality < {_EDGES[b_min]!r}")
    _, full_sql = STAGED_R11["token_budget_corpus"]
    scored_prefix = full_sql.split("SELECT doc_id, quality, n_tokens FROM (")[0]
    eligible_in_boundary = con.execute(
        scored_prefix
        + f"SELECT count(*) FROM scored WHERE {' AND '.join(conds)}"
    ).fetchall()[0][0]
    assert 0 < kept_in_boundary < eligible_in_boundary, (
        b_min, kept_in_boundary, eligible_in_boundary,
    )


def test_no_null_text_precondition(con):
    """budget_select excludes NULL-score/weight rows; the oracle
    restates that as WHERE text IS NOT NULL. Both only coincide while
    NULL text is the sole source of NULL quality/n_tokens — which holds
    for this corpus; pin it here, not on registration day."""
    nulls = con.execute(
        "SELECT count(*) FROM documents WHERE text IS NULL"
    ).fetchall()[0][0]
    assert nulls == 0


def test_staged_plan_shape(spark):
    """What the promotion will fence (r13 single-reference-tail form,
    budget_select): two parquet scans (one histogram control subtree +
    one output branch — the second tail reference and its duplicated
    control subtree are gone), two Windows neither of which totals the
    corpus (ONE bins-sized boundary locator + the boundary-bucket-only
    cumsum), the one-row control frame broadcast onto the corpus, and
    no Python eval anywhere — one fully lazy query, no build-time
    Spark job."""
    fn, _ = STAGED_R11["token_budget_corpus"]
    df = fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2
    assert plan.count("Window") == 2
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row control join
    for marker in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert marker not in plan, plan
