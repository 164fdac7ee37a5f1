"""Local replica of the driver's DuckDB-oracle comparison.

Mimics CORRECTNESS_r{N}.json: run the Spark query and the oracle SQL on the
same parquet tables, then compare row count, column names, and
order-insensitive values (columns sorted by name, rows sorted). Floats are
compared EXACTLY — the driver hashes values, so our queries must be
bit-stable across engines (see inventory.py determinism rules).
"""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

from example_cdk_dynamodb_stream_to_redshift_spark.schemas import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def normalized_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalized_rows(s_cols, s_rows)
    dn = normalized_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, f"value mismatch at sorted-row {i}:\n  spark={a}\n  duckdb={b}"
