"""Oracle output-type lint — the permanent HUGEINT sweep.

DuckDB widens integer aggregates: bare ``SUM(BIGINT)`` / ``list_sum`` /
windowed SUM return HUGEINT (int128). The driver hashes oracle values after
an Arrow transfer, where int128 does NOT hash like Spark's int64 — rows and
schema match but hash_match fails. This bug class burned a driver row in two
consecutive rounds (doc_repetition_stats r2; embedding_norm_quantize +
sequence_packing r3), so the one-off DESCRIBE sweep is now a test: every
registered oracle is DESCRIBE'd against the sf0.01 views and its OUTPUT
columns must be free of hash-unsafe types. Registering a new bare-SUM oracle
turns this red immediately.

DESCRIBE plans without executing, so the whole sweep is sub-second; it also
catches oracle syntax errors long before the driver does.
"""

from __future__ import annotations

import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY

from .conftest import SF_CORRECTNESS
from .oracle import duckdb_connection

# int128 family: survives DESCRIBE, poisons the driver's value hash
HASH_UNSAFE_TYPES = ("HUGEINT", "UHUGEINT")

_ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def con():
    con = duckdb_connection(SF_CORRECTNESS)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_output_types_hash_safe(con, name):
    rel = con.execute(f"DESCRIBE {REGISTRY[name].oracle}")
    bad = [
        (col, typ)
        for col, typ, *_ in rel.fetchall()
        if any(u in typ.upper() for u in HASH_UNSAFE_TYPES)
    ]
    assert not bad, (
        f"oracle '{name}' emits hash-unsafe output column types {bad}: "
        "wrap the expression in CAST(... AS BIGINT) (DuckDB widens integer "
        "SUM/list_sum/windowed SUM to HUGEINT, which breaks the driver's "
        "value hash even when all values are int64-range)"
    )
