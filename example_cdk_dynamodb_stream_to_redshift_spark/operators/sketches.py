"""Mergeable distinct-count sketches: materialize once per shard, merge
anywhere — the 100 TB cardinality pattern.

``approx_count_distinct`` (already driver-checked in
``approx_distinct_users``) answers ONE question per corpus scan. At
100 TB the pattern that matters is different: sketch each shard/partition
ONCE into a tiny binary column (a Datasketches HLL, Spark 4's
``hll_sketch_agg``), persist the sketch table next to the data, and
answer every later cardinality question — global, regrouped, rolled up
day->month, unioned across tables — by merging kilobyte sketches with
``hll_union_agg`` instead of rescanning terabytes. Sketch algebra is
commutative/associative and hash-deterministic, so estimates are
reproducible across partitionings and runs (pinned in
tests/test_sketches.py, including a parquet round-trip of the binary
column and merge-vs-direct equality).

The reference (sql/queries.sql) has no approximate surface; this extends
the engine's pipeline family (SURVEY.md north-star) where corpus-scale
reach/dedup-cardinality dashboards live. All JVM-side: no Python
boundary, whole-stage codegen around the agg, one shuffle per
sketch/merge keyed by the (bounded) shard columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_sketches(
    df: DataFrame,
    shard_cols: list[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """(shard_cols..., <sketch_col> binary): one HLL sketch of
    ``value_col``'s distinct values per shard. ~``2^lgk`` bytes per
    sketch regardless of shard size; the table this returns is the
    persistable artifact (write it as parquet beside the data)."""
    return df.groupBy(*shard_cols).agg(
        F.expr(f"hll_sketch_agg({value_col}, {lgk})").alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """(group_cols..., <sketch_col> binary): merge sketches UP a level but
    keep them as sketches — the hierarchical pattern (hour->day->month
    tables, each persisted, each still mergeable further). Estimates from
    a rolled-up level track the flat merge within the HLL error envelope
    (union re-encoding is not bit-identical; pinned in
    tests/test_sketches.py)."""
    return sketches.groupBy(*group_cols).agg(
        F.expr(f"hll_union_agg({sketch_col})").alias(sketch_col)
    )


def merged_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
    out_col: str = "distinct_est",
) -> DataFrame:
    """Merge sketches (all of them, or regrouped by ``group_cols`` — the
    day->month / shard->source roll-up) and return the distinct-count
    estimate as int64. Reads ONLY the sketch table: the original data is
    never rescanned."""
    grouped = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    return grouped.agg(
        F.expr(
            f"hll_sketch_estimate(hll_union_agg({sketch_col}))"
        ).alias(out_col)
    )
