"""Gap-based sessionization over an event stream.

Uses Spark's native ``F.session_window`` (the same operator Structured
Streaming uses for streaming session aggregation, so this code is
batch/stream portable): events for a key merge into one session while each
gap is strictly less than ``gap``; a gap >= ``gap`` starts a new session.

Scale: one shuffle on the grouping key; session assembly is a per-partition
merge — no window-function sort pass and no driver involvement. Per-key
event counts bound memory; AQE splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame, key: str, ts: str, gap: str = "30 minutes"
) -> DataFrame:
    """Collapse events into per-key sessions; returns one row per session
    with ``session_start`` / ``session_end`` (min/max event time — not the
    gap-extended window end) and ``n_events``."""
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("_w"))
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_w")
    )
