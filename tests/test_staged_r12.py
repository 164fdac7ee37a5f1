"""Round-12 staged driver candidate (plans/staged_r12.py): DuckDB
equivalence of the two-phase heavy-hitter recount against the pure
SEMANTIC oracle at sf0.001, the no-false-negative margin the
equivalence rests on (re-derived from the data, so parquet drift fails
here loudly instead of as a red driver row on registration day), and
the broadcast-semi-join plan shape the promotion will fence."""

from __future__ import annotations

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r12 import (
    K,
    MIN_COUNT,
    N_SLICES,
    STAGED_R12,
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


@pytest.mark.parametrize("name", sorted(STAGED_R12))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R12[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_column_names_match_oracle(spark, con):
    """The driver sorts columns BY NAME before hashing — a Spark/oracle
    name mismatch hash-fails even on equal values."""
    fn, sql = STAGED_R12["heavy_hitter_recount"]
    spark_cols = fn(spark, SF_DIR).columns
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert spark_cols == duck_cols == ["key", "cnt"]


def test_no_false_negative_margin_holds_on_this_data(con):
    """The semantic oracle is only valid in the no-false-negative
    regime: MIN_COUNT must exceed the summed per-slice truncation
    thresholds (the exact max dropped count per slice at top-K), and
    K must genuinely truncate every slice — otherwise the green row
    would stop proving the two-phase machinery and start depending on
    luck. Re-derive both from the parquet itself."""
    rows = con.execute(
        f"""
        WITH tok AS (SELECT CAST(doc_id % {N_SLICES} AS INT) AS b,
                            unnest(string_split(text, ' ')) AS key
                     FROM documents),
        counts AS (SELECT b, key, COUNT(*) AS cnt FROM tok GROUP BY b, key),
        ranked AS (SELECT b, cnt,
                          row_number() OVER (PARTITION BY b
                                             ORDER BY cnt DESC, key) AS rn
                   FROM counts)
        SELECT b,
               COALESCE(MAX(CASE WHEN rn > {K} THEN cnt END), 0) AS thresh,
               COUNT(*) AS vocab
        FROM ranked GROUP BY b ORDER BY b
        """
    ).fetchall()
    assert len(rows) == N_SLICES
    assert all(vocab > K for _, _, vocab in rows), rows  # truncating
    assert all(thresh > 0 for _, thresh, _ in rows), rows
    sum_thresh = sum(thresh for _, thresh, _ in rows)
    assert MIN_COUNT > sum_thresh, (MIN_COUNT, sum_thresh)


def test_result_is_a_strict_nonempty_subset_of_the_vocabulary(con):
    """An all-kept or none-kept driver row would not exercise the
    candidate pruning: some token must reach MIN_COUNT and some must
    not."""
    _, sql = STAGED_R12["heavy_hitter_recount"]
    kept = con.execute(sql).fetchall()
    vocab_n = con.execute(
        "SELECT count(DISTINCT k) FROM (SELECT unnest(string_split("
        "text,' ')) AS k FROM documents) t"
    ).fetchall()[0][0]
    assert 0 < len(kept) < vocab_n, (len(kept), vocab_n)


def test_staged_plan_shape(spark):
    """What a promotion will fence: the recount is ONE corpus pass with
    a broadcast LEFT-SEMI hash probe (candidates are kilobytes) — no
    sort-merge join, no Python eval anywhere. The per-slice summaries
    are localCheckpointed at construction, so the recount plan reads
    their bounded RDDs, never re-derives them."""
    fn, _ = STAGED_R12["heavy_hitter_recount"]
    plan = (
        fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    for marker in ("SortMergeJoin", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, plan
