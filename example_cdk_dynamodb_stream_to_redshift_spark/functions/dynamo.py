"""Scalar helpers mirroring the reference's Redshift SQL functions.

All are thin compositions of built-in ``pyspark.sql.functions`` — they stay
inside whole-stage codegen (no Python UDFs anywhere on this path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_timestamp(col: Column | str) -> Column:
    """``TIMESTAMP 'epoch' + (ms::BIGINT/1000) * INTERVAL '1 second'``.

    Reference: sql/incremental_sync_members.sql:28. Note the reference's
    integer division: precision is SECONDS, not millis — we preserve that
    with floor(ms/1000).
    """
    c = F.col(col) if isinstance(col, str) else col
    # exact decimal division, not double `/`: ms magnitudes lose ulps as double
    return F.timestamp_seconds(
        F.floor(c.cast("decimal(20,0)") / F.lit(1000)).cast("long")
    )


def strip_prefix(col: Column | str, prefix: str) -> Column:
    """Strip a literal leading prefix (``M_``, ``Q_``, ``MQ_``, ``MQ#M_``).

    The reference uses ``LTRIM(pk, 'M_')`` (sql/initial_load_members.sql:3),
    which in Redshift trims a CHARACTER SET, not a literal prefix — safe there
    only because uuids are hex. We implement the intent (literal prefix strip)
    via anchored regexp_replace; divergence documented in SURVEY.md §7.
    """
    import re

    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "^" + re.escape(prefix), "")


def av_string(col: str) -> Column:
    """Navigate a DynamoDB attribute-value ``{"S": ...}`` struct field.

    ``av_string("Item.memberId")`` ≙ Redshift ``item."memberId"."S"``
    (sql/initial_load_member_quests.sql:3-6).
    """
    return F.col(f"{col}.S")


def av_number(col: str) -> Column:
    """Navigate ``{"N": "12.34"}`` and cast to double (numbers are strings on
    the wire, lib/lambda/index.ts:85-95)."""
    return F.col(f"{col}.N").cast("double")
