"""Round-13 staged driver candidates (plans/staged_r13.py): DuckDB
equivalence of both sampling queries at sf0.001, column-name parity
(the driver sorts columns by name before hashing), the k-boundary
priority margin the weighted oracle's float-order argument rests on
(re-derived from the parquet, so data drift fails loudly here instead
of as a red driver row on registration day), and genuine-truncation
checks so a green row keeps proving the sampling machinery."""

from __future__ import annotations

import duckdb
import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r13 import (
    K_PER_SOURCE,
    STAGED_R13,
    WS_K,
    WS_SEED,
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


@pytest.mark.parametrize("name", sorted(STAGED_R13))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R13[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_column_names_match_oracle(spark, con):
    for name, want in (
        ("uniform_sample_by_source", ["source", "key", "h"]),
        ("weighted_doc_sample", ["key", "w"]),
    ):
        fn, sql = STAGED_R13[name]
        spark_cols = fn(spark, SF_DIR).columns
        duck_cols = [d[0] for d in con.execute(sql).description]
        assert spark_cols == duck_cols == want


def test_uniform_sampling_genuinely_truncates(con):
    """Every source must hold MORE than K_PER_SOURCE docs, or the
    'sample' degenerates to SELECT DISTINCT and the row stops proving
    the bounded-heap machinery."""
    rows = con.execute(
        "SELECT source, count(DISTINCT doc_id) FROM documents GROUP BY source"
    ).fetchall()
    assert rows and all(n > K_PER_SOURCE for _, n in rows)


def test_weighted_boundary_margin_is_libm_safe(con):
    """The weighted oracle's validity argument: the output is
    integer-only and the float priority only ORDERS, so equivalence
    needs the k-boundary gap to dwarf any Spark-vs-DuckDB libm ulp
    divergence (~1e-16 relative). Re-derive the gap from the data."""
    rows = con.execute(
        f"""
        SELECT ln((CAST(CAST('0x' || substr(md5('{WS_SEED}|' || key), 1, 16)
                        AS UBIGINT) AS DOUBLE) + 0.5)
                  / 18446744073709551616.0) / w AS pr
        FROM (SELECT CAST(doc_id AS VARCHAR) AS key,
                     CAST(len(string_split(text, ' ')) AS DOUBLE) AS w
              FROM documents
              WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        WHERE w > 0 ORDER BY pr DESC LIMIT {WS_K + 1}
        """
    ).fetchall()
    assert len(rows) == WS_K + 1  # population genuinely exceeds k
    kth, beyond = rows[WS_K - 1][0], rows[WS_K][0]
    assert (kth - beyond) / abs(kth) > 1e-9
