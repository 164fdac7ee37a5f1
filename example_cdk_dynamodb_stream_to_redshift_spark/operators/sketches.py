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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches: the DETERMINISTIC mergeable
# distinct-count sketch (Bar-Yossef et al. 2002; Beyer et al., SIGMOD'07).
# ---------------------------------------------------------------------------
#
# The HLL family above is the production default, but its binary is
# engine-private: no independent engine can re-derive it, so its driver
# checks are rows-only. KMV trades a larger sketch (k hashes instead of
# 2^lgk registers) for full cross-engine reproducibility: the sketch IS
# the k lexicographically-smallest md5 hex digests of the shard's
# distinct values — a pure function of the value set that DuckDB can
# restate exactly (ORDER BY md5 LIMIT k), and the union of two sketches'
# min-k is the min-k of the union, so merge algebra is EXACT, not just
# estimate-stable. Estimate: if the sketch holds fewer than k hashes the
# count is exact (the sketch saw every distinct value); otherwise
# (k-1)/U_k where U_k is the k-th smallest hash as a fraction of the
# hash space (first 16 hex chars / 2^64 — md5 is uniform, the truncation
# keeps the math in one int64 word).
#
# Scale shape (the point): the corpus is NEVER shuffled and no group's
# distinct set is ever collected. One Arrow pass emits per-batch partials
# (<= k hashes per shard per batch — numpy unique + partition, bounded
# memory regardless of batch cardinality); the only shuffle carries those
# bounded partials keyed by shard; the final min-k is a codegen'd
# flatten/sort/slice over <= k * n_batches rows per shard. Same
# partial->merge recipe as the classifier's gradient partials and the
# Bloom build.


def kmv_sketches(
    df: DataFrame,
    shard_cols: list[str],
    value_col: str,
    k: int = 256,
    sketch_col: str = "sketch",
) -> DataFrame:
    """(shard_cols..., <sketch_col> array<string>): the k smallest md5
    hex digests of ``value_col``'s distinct values per shard — the
    persistable KMV sketch table (write it as parquet beside the data,
    exactly like shard_sketches' HLL form)."""
    # NULL values don't count (COUNT(DISTINCT) semantics, and both md5's
    # NULL-in/NULL-out and numpy's object-sort would otherwise differ per
    # engine); a shard whose values are all NULL emits no sketch row.
    hashed = df.select(
        *shard_cols, F.md5(F.col(value_col).cast("string")).alias("_h")
    ).filter(F.col("_h").isNotNull())
    part_schema = T.StructType(
        [hashed.schema[c] for c in shard_cols]
        + [T.StructField("_hs", T.ArrayType(T.StringType()))]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per batch, per shard: k smallest DISTINCT hashes. numpy unique
        # sorts, so the slice is the min-k; output is bounded by
        # k * shards-in-batch rows however large the batch is.
        import numpy as np

        for pdf in batches:
            groups = pdf.groupby(list(pdf.columns[:-1]), sort=False, dropna=False)
            keys, arrays = [], []
            for key, g in groups:
                hs = np.unique(g["_h"].to_numpy())
                keys.append(key if isinstance(key, tuple) else (key,))
                arrays.append(list(hs[:k]))
            out = pd.DataFrame(keys, columns=list(pdf.columns[:-1]))
            out["_hs"] = arrays
            yield out

    merged = (
        hashed.mapInPandas(partials, part_schema)
        .groupBy(*shard_cols)
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("_hs")))),
                1,
                k,
            ).alias(sketch_col)
        )
    )
    return merged


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge KMV sketches UP a level (hour->day, shard->source) but keep
    them sketches: min-k of the union of min-k sets == min-k of the union
    of the underlying value sets, so roll-ups lose NOTHING relative to
    sketching the raw union (exact-equality-pinned in tests). All
    codegen'd array algebra; only kilobyte sketch rows shuffle."""
    return sketches.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list(sketch_col)))),
            1,
            k,
        ).alias(sketch_col)
    )


def kmv_estimate(
    sketches: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
    out_col: str = "distinct_est",
) -> DataFrame:
    """Merge (optionally regrouped) and estimate: exact ``size(sketch)``
    when the sketch is under-full (it saw every distinct value), else
    (k-1)/U_k over the k-th smallest hash's leading-64-bit fraction.
    Reads ONLY the sketch table — the data is never rescanned."""
    # groupBy(*[]) is a global aggregation, so the no-group case is just
    # kmv_merge with no keys — one merge expression to maintain
    grouped = kmv_merge(sketches, group_cols or [], k, sketch_col)
    kth = F.element_at(F.col(sketch_col), k)
    # leading 64 bits of the k-th hash as an exact double-free fraction:
    # conv() returns the unsigned value as DECIMAL-safe string -> DECIMAL(20,0)
    kth_u64 = F.conv(F.substring(kth, 1, 16), 16, 10).cast(T.DecimalType(20, 0))
    est = F.when(
        F.size(sketch_col) < k, F.size(sketch_col).cast("double")
    ).otherwise(
        F.lit(float((k - 1) * 2**64)) / kth_u64.cast("double")
    )
    keep = group_cols or []
    return grouped.select(*keep, est.alias(out_col))
