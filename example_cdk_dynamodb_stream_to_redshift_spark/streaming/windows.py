"""Event-time windowed aggregation — one definition for batch AND stream.

The reference has no event-time windows (SURVEY.md §2.8: "No tumbling/
sliding/session windows"), but they are the backbone of any Spark-native
analytics engine's streaming surface, and `F.window` / `F.session_window`
are the rare operators that run unchanged in both execution modes. These
helpers take either a batch DataFrame or a streaming DataFrame:

- batch:   plain hash aggregation over the window struct;
- stream:  stateful windowed aggregation; the ``watermark`` bounds state
  (windows older than max(event time) - watermark are finalized and their
  state evicted — at 100 TB/day of events, unbounded window state is the
  thing that kills a job, not throughput).

Equivalence of the two modes is asserted in tests/test_streaming_windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts: str, watermark: str | None) -> DataFrame:
    if df.isStreaming and watermark:
        return df.withWatermark(ts, watermark)
    return df


def windowed_stats(
    events: DataFrame,
    ts: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` is given) event-time counts+sums.
    Columns: window_start, window_end, n_events, total_value."""
    src = _with_watermark(events, ts, watermark)
    win = F.window(ts, window, slide) if slide else F.window(ts, window)
    return (
        src.groupBy(win.alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def windowed_sessions(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key gap sessions (see operators/sessions.py), streaming-capable:
    with a watermark, sessions close once no event can extend them."""
    src = _with_watermark(events, ts, watermark)
    return (
        src.groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("_w"))
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_w")
    )
