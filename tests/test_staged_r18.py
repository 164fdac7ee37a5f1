"""Round-18 staged driver candidate (plans/staged_r18.py): DuckDB
equivalence of group-scoped boilerplate pruning (word mode) at sf0.001,
column-name parity, and genuine-signal checks (pruning actually
happened, a FEW docs are deliberately emptied so the emptied-doc
contract rides the driver row, kept counts vary, reassembly preserved
order)."""

from __future__ import annotations

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r18 import (
    STAGED_R18,
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


@pytest.mark.parametrize("name", sorted(STAGED_R18))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R18[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_column_names_match_oracle(spark, con):
    fn, sql = STAGED_R18["boilerplate_pruned_docs"]
    spark_cols = fn(spark, SF_DIR).columns
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert (
        spark_cols
        == duck_cols
        == ["doc_id", "n_segments", "n_segments_kept", "clean_text"]
    )


def test_pruning_carries_genuine_signal(con):
    """Every doc lost its source-frequent words (the synthetic corpus
    shares vocabulary within a source), a FEW docs are fully emptied
    (the emptied-doc contract: clean_text='', kept=0), most are
    pruned-but-kept with varying kept counts, and clean_text's word
    count equals n_segments_kept — so a green row proves drop-set
    selection AND ordered reassembly AND the emptied contract, not a
    no-op pass-through."""
    _, sql = STAGED_R18["boilerplate_pruned_docs"]
    rows = con.execute(sql).fetchall()
    assert all(kept < total for _, total, kept, _ in rows)
    emptied = [r for r in rows if r[2] == 0]
    assert 0 < len(emptied) < len(rows) // 2
    assert all(text == "" for _, _, _, text in emptied)
    assert len({kept for _, _, kept, _ in rows}) > 2
    for _, _, kept, text in rows[:50]:
        if kept:
            assert len(text.split(" ")) == kept
