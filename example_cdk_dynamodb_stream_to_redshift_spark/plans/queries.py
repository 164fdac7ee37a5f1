"""The reference's four analytics reports (sql/queries.sql), Spark-first.

These run over the CDC target tables (member / quest / member_quest). The
driver-facing operator inventory over the TPC-H-ish tables lives in
plans/inventory.py; these functions are exercised by the pytest CDC E2E suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recent_syncs(member: DataFrame, limit: int = 5) -> DataFrame:
    """sql/queries.sql:1-8 — 5 most recent syncs with their lag (O1, F11, P3)."""
    return (
        member.filter(F.col("syncTimestamp").isNotNull())
        .select(
            "memberId",
            "memberName",
            "approximateUpdateTimestamp",
            "syncTimestamp",
            (F.col("syncTimestamp") - F.col("approximateUpdateTimestamp")).alias(
                "syncLag"
            ),
        )
        .orderBy(F.desc("syncTimestamp"))
        .limit(limit)
    )


def worst_sync_lag_today(member: DataFrame, limit: int = 5) -> DataFrame:
    """sql/queries.sql:11-19 — worst lag among today's updates (O2, P6)."""
    return (
        member.filter(F.to_date("approximateUpdateTimestamp") == F.current_date())
        .select(
            "memberId",
            "memberName",
            "approximateUpdateTimestamp",
            "syncTimestamp",
            (F.col("syncTimestamp") - F.col("approximateUpdateTimestamp")).alias(
                "syncLag"
            ),
        )
        .orderBy(F.desc("syncLag"))
        .limit(limit)
    )


def rewards_by_member(member_quest: DataFrame, member: DataFrame) -> DataFrame:
    """sql/queries.sql:22-32 — total dollars earned per member (J1, A3, O3).

    member is the small dimension: broadcast so the fact side never shuffles.
    """
    return (
        member_quest.join(F.broadcast(member), "memberId", "inner")
        .groupBy("memberId", "memberName")
        .agg(F.sum("dollarsEarned").alias("totalDollarsEarned"))
        .orderBy(F.desc("totalDollarsEarned"))
    )


def rewards_by_quest(member_quest: DataFrame, quest: DataFrame) -> DataFrame:
    """sql/queries.sql:35-45 — total dollars earned per quest (J2, A4, O3)."""
    return (
        member_quest.join(F.broadcast(quest), "questId", "inner")
        .groupBy("questId", "questName")
        .agg(F.sum("dollarsEarned").alias("totalDollarsEarned"))
        .orderBy(F.desc("totalDollarsEarned"))
    )
