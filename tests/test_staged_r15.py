"""Round-15 staged driver candidate (plans/staged_r15.py): DuckDB
equivalence of the min-shingle source-overlap matrix at sf0.001,
column-name parity, and genuine-signal checks (neither empty nor
all-pairs, so a green row keeps proving the fingerprint + bounded
pair-generation machinery)."""

from __future__ import annotations

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r15 import (
    STAGED_R15,
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


@pytest.mark.parametrize("name", sorted(STAGED_R15))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R15[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_column_names_match_oracle(spark, con):
    fn, sql = STAGED_R15["source_content_overlap"]
    spark_cols = fn(spark, SF_DIR).columns
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert spark_cols == duck_cols == ["source_a", "source_b", "n_shared"]


def test_overlap_carries_genuine_signal(con):
    """Non-vacuous on both ends: some source pairs share fingerprints
    (else a broken fingerprint returning NULL everywhere passes) but
    not ALL pairs do (else a constant fingerprint passes)."""
    _, sql = STAGED_R15["source_content_overlap"]
    rows = con.execute(sql).fetchall()
    n_sources = con.execute(
        "SELECT COUNT(DISTINCT source) FROM documents WHERE source IS NOT NULL"
    ).fetchone()[0]
    assert 0 < len(rows) < n_sources * (n_sources - 1) // 2
