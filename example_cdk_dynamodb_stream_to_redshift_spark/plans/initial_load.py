"""Initial (bootstrap) load: DynamoDB export -> target tables.

Reference parity: sql/initial_load_members.sql / _quests.sql /
_member_quests.sql, executed by scripts/initial_load_from_export.sh:173-205.
Each loader: route rows by pk prefix (LIKE with escaped underscore), strip the
key prefix, navigate the attribute-value map, cast, and stamp
``eventName='INITIAL_LOAD'`` + a per-statement ``GETDATE()`` sync timestamp.

GETDATE() stability: Redshift evaluates GETDATE() once per statement; we pass
one driver-computed ``sync_ts`` literal to every loader in a batch so all rows
of one load share a timestamp (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dynamo import av_number, av_string, strip_prefix


def _sync_lit(sync_ts: dt.datetime | None):
    return F.lit(sync_ts).cast("timestamp") if sync_ts else F.current_timestamp()


def initial_load_members(dump: DataFrame, sync_ts: dt.datetime | None = None) -> DataFrame:
    """sql/initial_load_members.sql:1-11 — pk LIKE 'M^_%' ESCAPE '^'."""
    return (
        dump.filter(F.col("Item.pk.S").startswith("M_"))
        .select(
            strip_prefix(av_string("Item.pk"), "M_").alias("memberId"),
            # name comes from the SORT KEY (item.sk."S",
            # sql/initial_load_members.sql:4), same as the CDC projection —
            # NOT the redundant memberName attribute, which only the
            # generator lambda happens to write
            av_string("Item.sk").alias("memberName"),
            _sync_lit(sync_ts).alias("approximateUpdateTimestamp"),
            F.lit("INITIAL_LOAD").alias("eventName"),
            _sync_lit(sync_ts).alias("syncTimestamp"),
        )
    )


def initial_load_quests(dump: DataFrame, sync_ts: dt.datetime | None = None) -> DataFrame:
    """sql/initial_load_quests.sql:1-11 — pk LIKE 'Q^_%' ESCAPE '^'."""
    return (
        dump.filter(F.col("Item.pk.S").startswith("Q_"))
        .select(
            strip_prefix(av_string("Item.pk"), "Q_").alias("questId"),
            av_string("Item.sk").alias("questName"),
            _sync_lit(sync_ts).alias("approximateUpdateTimestamp"),
            F.lit("INITIAL_LOAD").alias("eventName"),
            _sync_lit(sync_ts).alias("syncTimestamp"),
        )
    )


def initial_load_member_quests(
    dump: DataFrame, sync_ts: dt.datetime | None = None
) -> DataFrame:
    """sql/initial_load_member_quests.sql:1-12 — pk LIKE 'MQ#%'.

    memberQuestId comes from sk ('MQ_<uuid>'), memberId from pk
    ('MQ#M_<memberUuid>'); dollarsEarned is the stringly-typed N value.
    """
    return (
        dump.filter(F.col("Item.pk.S").startswith("MQ#"))
        .select(
            strip_prefix(av_string("Item.sk"), "MQ_").alias("memberQuestId"),
            strip_prefix(av_string("Item.pk"), "MQ#M_").alias("memberId"),
            av_string("Item.questId").alias("questId"),
            av_number("Item.dollarsEarned").alias("dollarsEarned"),
            _sync_lit(sync_ts).alias("approximateUpdateTimestamp"),
            F.lit("INITIAL_LOAD").alias("eventName"),
            _sync_lit(sync_ts).alias("syncTimestamp"),
        )
    )


def initial_load_all(
    dump: DataFrame, sync_ts: dt.datetime | None = None
) -> dict[str, DataFrame]:
    """Run all three loaders over one export scan (the dump DataFrame is
    reused; Spark shares the scan via its cached logical plan if persisted
    by the caller)."""
    return {
        "member": initial_load_members(dump, sync_ts),
        "quest": initial_load_quests(dump, sync_ts),
        "member_quest": initial_load_member_quests(dump, sync_ts),
    }
