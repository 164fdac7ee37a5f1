"""sources/tables.py loader guards: a foreign session (non-UTC timezone,
nanos conf unset) must be corrected before the NTZ -> TIMESTAMP cast, so
timestamps never silently shift by the zone offset."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import (
    load_table,
)

from .conftest import SF_SMOKE

_TZ = "spark.sql.session.timeZone"


def test_foreign_timezone_session_gets_pinned_to_utc(spark):
    # Baseline under the engine-built (UTC) session.
    want = [
        tuple(r)
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_id", F.unix_millis("ts").alias("ms"))
        .orderBy("event_id")
        .limit(50)
        .collect()
    ]
    original = spark.conf.get(_TZ)
    try:
        # Simulate the driver harness building its own session in a zone
        # with a large offset: without the guard the NTZ cast shifts every
        # epoch value by that offset (verified 5h under America/New_York).
        spark.conf.set(_TZ, "America/New_York")
        df = load_table(spark, SF_SMOKE, "events")
        assert spark.conf.get(_TZ) == "UTC"  # loader repinned the session
        got = [
            tuple(r)
            for r in df.select("event_id", F.unix_millis("ts").alias("ms"))
            .orderBy("event_id")
            .limit(50)
            .collect()
        ]
        assert got == want
    finally:
        spark.conf.set(_TZ, original)
