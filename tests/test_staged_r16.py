"""Round-16 staged driver candidate (plans/staged_r16.py): DuckDB
equivalence of the corpus version diff at sf0.001, column-name parity,
and genuine-signal checks (all four statuses present with plausible
proportions, so a green row keeps proving the membership AND the
content-envelope compare, not just one of them)."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r16 import (
    STAGED_R16,
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


@pytest.mark.parametrize("name", sorted(STAGED_R16))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R16[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_column_names_match_oracle(spark, con):
    fn, sql = STAGED_R16["corpus_version_diff"]
    spark_cols = fn(spark, SF_DIR).columns
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert spark_cols == duck_cols == ["doc_id", "status", "n_old", "n_new"]


def test_diff_carries_genuine_signal(con):
    """All four statuses must appear (the %3/%5/%7 mutations guarantee
    each), statuses must partition the id set, and the removed/added
    counts must match the mutation arithmetic — a diff that lumps
    everything under one status cannot go green."""
    _, sql = STAGED_R16["corpus_version_diff"]
    rows = con.execute(sql).fetchall()
    by_status = Counter(r[1] for r in rows)
    assert set(by_status) == {"added", "removed", "changed", "unchanged"}
    # removed = ids % 3 != 0 AND % 5 == 0 (in old, not new);
    # added    = ids % 3 == 0 AND % 5 != 0 (in new, not old)
    n = con.execute(
        "SELECT count(*) FILTER (doc_id % 3 <> 0 AND doc_id % 5 = 0), "
        "count(*) FILTER (doc_id % 3 = 0 AND doc_id % 5 <> 0) "
        "FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL)"
    ).fetchone()
    assert by_status["removed"] == n[0]
    assert by_status["added"] == n[1]
    # changed = rewritten docs present on both sides (% 7, not % 3/% 5 hit)
    assert 0 < by_status["changed"] < by_status["unchanged"]
