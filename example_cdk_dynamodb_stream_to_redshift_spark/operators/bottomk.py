"""Bottom-k uniform samples: the DETERMINISTIC, MERGEABLE sample of k
distinct keys — keep the k keys with the smallest ``md5(key)`` (Cohen &
Kaplan's bottom-k sketch family, applied as a sample rather than an
estimator).

Why hash-order instead of ``rand()``: md5 is uniform over keys, so the
k hash-smallest distinct keys are a uniform-without-replacement sample
of the key population — but unlike a random sample it is a PURE
FUNCTION of the key set. Re-runs reproduce it, re-partitionings
reproduce it, and the merge algebra is EXACT: the bottom-k of a union
is the bottom-k of the parts' bottom-ks, so per-shard/per-batch samples
of bounded size compose into the corpus sample without ever rescanning
the corpus. That is the property ``rand()``-based sampling
(``df.sample``, ``sampleBy``) cannot offer — resampling a grown corpus
rescans everything and invalidates every downstream artifact keyed on
the old sample.

The same artifact doubles as the KMV distinct-count sketch
(operators/sketches.py stores hash ARRAYS per shard for pure counting;
this keeps the KEYS, so the sample is also inspectable/joinable):
``distinct_estimate`` applies the classic (k-1)/U_k estimator to the
sample's largest kept hash, exact whenever the population fits in k.

Scale shape: one pass derives ``(strata, key, h)`` with a MAP-SIDE
partial dedup (groupBy carries each executor's local distinct keys,
not rows); the unstratified bottom-k is TakeOrderedAndProject (bounded
per-partition heaps, never a global sort), the stratified form is one
window per stratum over the deduped keys. The maintained counterpart
(streaming/sample_maintenance.BottomKSample) bounds every step by
k x strata per batch and answers re-sampling from the kilobyte store
alone. Fetching full rows for a sample is the two-phase recount shape
(operators/heavyhitters.exact_recount): broadcast the kilobyte key set,
ONE semi-join scan.

Reference tie-in: the reference has no sampling surface (sql/queries.sql
caps by ORDER BY .. LIMIT); this is the corpus-curation form — inspect
a reproducible k-subset of an unbounded stream, at any time, from
bounded state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def key_hash(key_col: Column | str) -> Column:
    """The sampling hash: lowercase md5 hex of the key's string form —
    uniform, engine-portable (DuckDB's md5 produces the identical
    digest, so the sample is batch-oracle-restatable), and totally
    ordered as a plain string comparison."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(c.cast("string"))


def bottomk_keys(
    df: DataFrame,
    key_col: str,
    k: int,
    strata_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(strata..., key, h)`` — the k hash-smallest DISTINCT keys (per
    stratum, when ``strata_cols`` is given): a deterministic uniform
    sample of the distinct-key population. NULL keys are excluded (a
    NULL key identifies nothing and would collapse to one hash).

    Keys are returned as strings (the hash input's exact form), so the
    sample artifact has a stable schema across callers and stores —
    the heavy-hitter store's convention.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    dedup = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *strata_cols,
            F.col(key_col).cast("string").alias("key"),
        )
        .distinct()  # HashAggregate: map-side partial dedup, keys only
        .withColumn("h", key_hash("key"))
    )
    if not strata_cols:
        # TakeOrderedAndProject: bounded per-partition heaps, no global sort
        return dedup.orderBy("h").limit(int(k))
    win = Window.partitionBy(*strata_cols).orderBy("h")
    rn = "__bk_rn__"
    return (
        dedup.withColumn(rn, F.row_number().over(win))
        .filter(F.col(rn) <= int(k))
        .drop(rn)
    )


def merge_samples(
    samples: DataFrame,
    k: int,
    strata_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Bottom-k over a union of bottom-k sample frames (``key``/``h``
    columns, plus strata) — EXACT algebra, not an approximation:
    min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)). Duplicate keys across
    parts (the same key sampled by two batches) collapse to one row.
    Operates on kilobyte sample frames only."""
    if k < 1:
        raise ValueError("k must be >= 1")
    dedup = samples.groupBy(*strata_cols, "key").agg(
        F.min("h").alias("h")  # h is a function of key: min == the value
    )
    if not strata_cols:
        return dedup.orderBy("h").limit(int(k))
    win = Window.partitionBy(*strata_cols).orderBy("h")
    rn = "__bk_rn__"
    return (
        dedup.withColumn(rn, F.row_number().over(win))
        .filter(F.col(rn) <= int(k))
        .drop(rn)
    )


def sample_rows(
    corpus: DataFrame, sample: DataFrame, key_col: str
) -> DataFrame:
    """Fetch the full corpus rows of a sample's keys: broadcast the
    kilobyte key set, ONE semi-join pass over the corpus (hash probe
    per row, non-sampled rows never shuffle) — the two-phase shape
    shared with heavyhitters.exact_recount."""
    keys = sample.select(F.col("key").alias("__bk_key__"))
    return corpus.join(
        F.broadcast(keys),
        F.col(key_col).cast("string") == F.col("__bk_key__"),
        "left_semi",
    )


def distinct_estimate(
    sample: DataFrame,
    k: int,
    strata_cols: tuple[str, ...] = (),
    out_col: str = "distinct_est",
) -> DataFrame:
    """KMV estimate of the distinct-key population from the sample
    itself (``(k-1)/U_k`` over the largest kept hash, Bar-Yossef et
    al.; exact count when the stratum's population fit inside k): the
    sample doubles as the cardinality sketch. Uses the md5 hex
    digest's first 16 chars as a 64-bit fraction — the
    operators/sketches.py KMV convention."""
    from pyspark.sql import types as T

    if k < 1:
        raise ValueError("k must be >= 1")
    grouped = sample.groupBy(*strata_cols)
    agg = grouped.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("max_h")
    )
    # leading 64 bits of the LARGEST kept hash (== the k-th smallest when
    # the sample is full) as an exact fraction — the sketches.py
    # kmv_estimate convention: conv -> DECIMAL(20,0), divide as double
    kth_u64 = F.conv(F.substring(F.col("max_h"), 1, 16), 16, 10).cast(
        T.DecimalType(20, 0)
    )
    est = F.when(
        F.col("n_kept") < int(k), F.col("n_kept").cast("double")
    ).otherwise(F.lit(float((k - 1) * 2**64)) / kth_u64.cast("double"))
    return agg.select(*strata_cols, est.alias(out_col))
