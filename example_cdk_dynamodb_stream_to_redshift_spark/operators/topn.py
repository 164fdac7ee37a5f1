"""Scalable per-key top-N selection (two-phase, salt-partitioned).

The naive plan — ``row_number() OVER (PARTITION BY key ORDER BY ord)`` then
``rn <= n`` — sorts EVERY row of every key group, and a hot key (one
``source`` holding half a 100 TB corpus) becomes a single straggler task.
This operator runs the same contract in two bounded phases:

1. Phase 1 splits each key into ``salt_buckets`` deterministic sub-groups
   (hash of a unique row key — content-derived, retry-stable) and keeps each
   sub-group's local top-``n``. Window partitions are ``(key, salt)``:
   1/salt_buckets of the hot key per task, and a task's window state is
   bounded by its partition slice.
2. Phase 2 ranks the survivors — at most ``salt_buckets * n`` rows per key,
   driver-independent and tiny — and keeps the true top-``n``.

Both phases are exact: every row of the true top-n survives phase 1 inside
its own sub-group (a local rank can only UNDERcount the global rank), so the
result is identical to the single-window form — same oracle.

Reference scope: beyond the reference app (its ORDER BY … LIMIT top-k, O1/O2
at sql/queries.sql:8,19, is global top-k; this is the per-GROUP generalization
a training pipeline needs for per-source caps / per-user rate limits).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_n_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    n: int,
    unique_key: str,
    salt_buckets: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-``n`` rows per ``key_cols`` group under ``order_cols``
    (row_number semantics — ties broken by order_cols; make the ordering
    total by including ``unique_key`` in ``order_cols`` for determinism).

    ``unique_key`` names a column whose hash salts phase 1; it must be
    unique per row (or at least spread hot groups) and is also the
    retry-stability anchor: pmod(xxhash64(key), buckets) re-computes
    identically when a task is replayed, unlike position-derived salts.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if salt_buckets <= 0:
        raise ValueError(f"salt_buckets must be positive, got {salt_buckets}")
    clashes = {"_salt", "_local_rn", rank_col} & set(df.columns)
    if clashes:
        raise ValueError(
            f"input columns {sorted(clashes)} collide with top_n_per_key's "
            f"working/output columns; rename them or pass a different rank_col"
        )
    keys = list(key_cols)
    salt = F.pmod(F.xxhash64(F.col(unique_key)), F.lit(salt_buckets)).cast("int")
    w_local = Window.partitionBy(*keys, "_salt").orderBy(*order_cols)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_local_rn", F.row_number().over(w_local))
        .filter(F.col("_local_rn") <= n)
        .drop("_local_rn")
    )
    w_final = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        survivors.drop("_salt")
        .withColumn(rank_col, F.row_number().over(w_final))
        .filter(F.col(rank_col) <= n)
    )
