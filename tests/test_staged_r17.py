"""Round-17 staged driver candidate (plans/staged_r17.py): DuckDB
equivalence of the GROUPED corpus version diff at sf0.001, column-name
parity, and genuine-signal checks (multiple sources, multiple statuses
per source, rollup consistent with the per-document staged_r16 diff —
so a green row proves the attribution rule, not a degenerate rollup)."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r16 import (
    STAGED_R16,
)
from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r17 import (
    STAGED_R17,
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


@pytest.mark.parametrize("name", sorted(STAGED_R17))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R17[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_column_names_match_oracle(spark, con):
    fn, sql = STAGED_R17["corpus_diff_by_source"]
    spark_cols = fn(spark, SF_DIR).columns
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert spark_cols == duck_cols == ["source", "status", "n_docs"]


def test_rollup_consistent_with_per_document_diff(con):
    """The grouped rollup must sum to the per-document diff's status
    totals (same mutations, same semantics — the rollup only adds
    attribution), and carry genuine per-source signal: more than one
    source, and at least one source showing all four statuses."""
    _, doc_sql = STAGED_R16["corpus_version_diff"]
    _, grp_sql = STAGED_R17["corpus_diff_by_source"]
    doc_status = Counter(r[1] for r in con.execute(doc_sql).fetchall())
    grp_rows = con.execute(grp_sql).fetchall()
    grp_status: Counter = Counter()
    per_source: dict = {}
    for source, status, n_docs in grp_rows:
        grp_status[status] += n_docs
        per_source.setdefault(source, set()).add(status)
    assert grp_status == doc_status
    assert len(per_source) > 1
    # the testdata's source is doc_id-correlated (src{doc_id % 20}), so
    # removed ids (% 5 == 0, % 3 != 0) cluster in their own sources —
    # which separates the two attribution paths: removed-only sources
    # prove OLD-side attribution, mixed sources prove NEW-side.
    assert any(statuses == {"removed"} for statuses in per_source.values())
    assert any(
        statuses >= {"added", "changed", "unchanged"}
        for statuses in per_source.values()
    )
    assert set(grp_status) == {"added", "removed", "changed", "unchanged"}
