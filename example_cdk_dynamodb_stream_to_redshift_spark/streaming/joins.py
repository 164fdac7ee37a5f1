"""Stream-stream interval join and watermark-bounded deduplication — one
definition for batch AND stream, like streaming/windows.py.

The reference joins only table-to-table inside Redshift (SURVEY.md §2.4);
joining two live CDC/event streams is the capability gap a Spark-native
engine closes. Both helpers accept batch or streaming inputs:

- ``interval_join``: inner equi-join on a key PLUS a time-range predicate
  (right event within ``[left_ts, left_ts + max_delay]``). In streaming
  mode the watermarks + the range condition let Spark bound join state:
  a buffered left row is evicted once the right watermark passes
  ``left_ts + max_delay`` — state is O(events within the delay window),
  not O(stream history). At 100 TB/day this bound is what makes the join
  runnable at all.
- ``deduped``: drop duplicate rows by key. Streaming uses
  ``dropDuplicatesWithinWatermark`` so the key-set state is evicted once
  the watermark passes (exact dedup within the lateness bound — the only
  honest guarantee an unbounded stream allows); batch uses plain
  ``dropDuplicates``.

Equivalence of the two modes is asserted in tests/test_stream_joins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner join rows sharing ``key`` where ``right_ts`` falls inside
    ``[left_ts, left_ts + max_delay]``. Column names must be disjoint apart
    from ``key`` (pre-project the inputs)."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    # rename the right key instead of joining lw[key] == rw[key]: when both
    # inputs derive from the SAME DataFrame (the batch self-join form),
    # lw[key] and rw[key] resolve to one attribute and PySpark emits a
    # "trivially true equals predicate ... use aliases" WARN on stderr —
    # benign here (dataset-id disambiguation still joins correctly) but it
    # reads like a swallowed AnalysisException in harness logs.
    rw = rw.withColumnRenamed(key, "_rkey")
    cond = (
        (lw[key] == rw["_rkey"])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").drop("_rkey")


def view_purchase_attribution(
    events: DataFrame, max_delay: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Attribute purchases to views by the same user within ``max_delay``:
    the classic two-stream funnel join, derived from one events source.
    Columns: user_id, view_id, view_ts, purchase_id, purchase_ts."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return interval_join(
        views,
        purchases,
        key="user_id",
        left_ts="view_ts",
        right_ts="purchase_ts",
        max_delay=max_delay,
        watermark=watermark,
    )


def deduped(
    df: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exact dedup by ``keys``. Streaming: ``dropDuplicatesWithinWatermark``
    keeps the FIRST-ARRIVED row per key, with state bounded by the
    watermark (duplicates arriving later than ``watermark`` after the
    original are not caught — the documented at-most-lateness contract).

    Batch keeps the earliest row by (``ts``, remaining columns) per key —
    deterministic, unlike ``dropDuplicates`` which keeps an arbitrary
    partition-order-dependent row. The two modes agree whenever producers
    emit in event-time order (the CDC case); a duplicate key re-sent with
    a DIFFERENT payload out of order is the one case where first-arrival
    and earliest-event-time can pick different rows."""
    if df.isStreaming:
        return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)
    from pyspark.sql import Window

    order_cols = [ts] + [c for c in df.columns if c not in keys and c != ts]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
