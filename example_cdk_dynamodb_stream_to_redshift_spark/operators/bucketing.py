"""Bucketed table layout — Spark's equivalent of Redshift DISTKEY/SORTKEY.

The reference declares `DISTKEY(5) SORTKEY(1)` on its materialized view
(sql/create_materialized_view.sql:18) so Redshift co-locates rows by key and
zone-maps by time. The Spark-native counterpart is hash-bucketed,
sorted-within-bucket table layout:

- ``bucketBy(n, key)``   -> every file belongs to hash(key) % n; two tables
  bucketed the same way join/aggregate WITHOUT a shuffle (the scan itself
  reports hash-partitioned distribution to the planner);
- ``sortBy(ts)``         -> parquet row-group min/max stats give the same
  time-range pruning a SORTKEY zone map does.

At 100 TB this is the difference between re-shuffling a fact table on every
join and shuffling it exactly once at write time. Verified in
tests/test_bucketing.py: the bucketed-bucketed join plan contains no
Exchange node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted-within-bucket)
    managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    writer = writer.sortBy(sort_col if sort_col else key)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Bucketing metadata comes from the catalog — a plain table read."""
    return spark.table(table)
