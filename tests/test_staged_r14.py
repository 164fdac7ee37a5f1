"""Round-14 staged driver candidate (plans/staged_r14.py): DuckDB
equivalence of the uniqueness profile at sf0.001, column-name parity
(the driver sorts columns by name before hashing), and
genuine-signal checks so a green row keeps proving the
df-computation + exchange-reuse machinery rather than a degenerate
all-unique corpus."""

from __future__ import annotations

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r14 import (
    RARITY_N,
    STAGED_R14,
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


@pytest.mark.parametrize("name", sorted(STAGED_R14))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R14[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_column_names_match_oracle(spark, con):
    fn, sql = STAGED_R14["doc_uniqueness_profile"]
    spark_cols = fn(spark, SF_DIR).columns
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert spark_cols == duck_cols == ["doc_id", "n_shingles", "n_unique"]


def test_corpus_carries_genuine_signal(con):
    """The row only proves the df machinery if the corpus holds BOTH
    shared and unique 8-grams — all-unique would pass with df silently
    broken to a constant 1, all-shared with the unique filter dropped."""
    _, sql = STAGED_R14["doc_uniqueness_profile"]
    rows = con.execute(sql).fetchall()
    assert any(u < n for _, n, u in rows if n)
    assert any(u > 0 for _, _, u in rows)
    # and short docs exercise the every-doc-keeps-a-row left join
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert len(rows) == n_docs
