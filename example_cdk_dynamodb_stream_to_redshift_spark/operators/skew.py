"""Skew mitigation for large joins: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit,
planner-independent variant for the pathological case AQE can't fix: ONE key
so hot that even a split partition's build side overflows (e.g. the null-ish
"unknown user" key owning 10% of a 100 TB fact table).

``salted_join`` spreads each hot fact-side key over ``salt_buckets`` shuffle
partitions by appending a deterministic per-row salt to the join key, and
replicates the small side once per bucket (small-side blow-up = |dim| x
buckets rows — acceptable precisely when the other side is the big one).
Equi-join semantics are preserved exactly: every (fact row, dim row) key
match meets in exactly one salt bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    unique_key: str | None = None,
) -> DataFrame:
    """Join ``large`` with ``small`` on column ``on``, salting the large
    side into ``salt_buckets`` sub-keys. Output columns = large ++ small
    (minus the duplicate key), same as ``large.join(small, on, how)``.

    ``how`` supports the fact-side-preserving joins (inner / left); right and
    full joins would need the salt on the other side.

    Pass ``unique_key`` (a column whose values are distinct per row, e.g. a
    row id) whenever one exists: the salt becomes
    ``pmod(xxhash64(unique_key), buckets)`` — content-derived yet pile-up
    free (unique inputs hash uniformly even for rows identical elsewhere),
    and trivially stable under task retries.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")

    if unique_key is not None:
        large_s = large.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(unique_key)), F.lit(salt_buckets)).cast("int"),
        )
    else:
        # No unique key: row-POSITION salt, not a content hash — the
        # motivating hot key (a null-ish "unknown" key) typically has rows
        # identical across all columns, and hashing content would send them
        # all to ONE salt bucket, the exact pile-up salting exists to break.
        #
        # Retry safety: the salt joins the shuffle key, so it must be STABLE
        # when a map task is recomputed after executor loss (else re-fetched
        # reducers see different routing than already-fetched ones — rows
        # duplicated/lost, the SPARK-23207 class of bug). monotonically
        # _increasing_id depends on intra-partition row order, so we pin that
        # order first with a full-row sortWithinPartitions (local sort, no
        # shuffle): identical rows may swap positions across retries, but
        # swapping identical rows yields the identical output. CAVEATS this
        # path inherits (prefer unique_key): sorting by all columns throws
        # for unorderable types (maps), and order-pinning assumes the
        # upstream itself recomputes deterministically — persist/checkpoint
        # the input first if it does not.
        large_s = large.sortWithinPartitions(*large.columns).withColumn(
            "_salt",
            F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
        )

    small_s = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )

    joined = large_s.join(small_s, [on, "_salt"], how)
    return joined.drop("_salt")
