"""Every driver-declared query must hash-match its DuckDB oracle at sf0.01 —
this test IS a local dry-run of the driver's correctness gate."""

from __future__ import annotations

import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY

from .conftest import SF_CORRECTNESS
from .oracle import compare, duckdb_connection


@pytest.fixture(scope="module")
def con():
    con = duckdb_connection(SF_CORRECTNESS)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, con, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, SF_CORRECTNESS)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's
    else:
        compare(df, con, q.oracle)
