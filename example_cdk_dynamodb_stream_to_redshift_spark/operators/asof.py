"""As-of (point-in-time) join — a temporal operator the reference's SQL
surface lacks but every event/CDC pipeline eventually needs (e.g. "state of
the dimension as of this event's timestamp", purchase->last-prior-view
attribution).

Spark has no ASOF JOIN primitive, and the naive formulation
(range theta-join + per-left-row max) explodes to |L|x|R| candidate pairs.
This implementation uses the union-tag-window pattern instead:

1. tag left rows (side=1) and right rows (side=0) and union them into one
   relation keyed by the join key with a common event-time column;
2. one shuffle: window PARTITION BY key ORDER BY (time, side, tiebreak);
3. ``last(value, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT
   carries the most recent right-side values forward onto each left row;
4. keep side=1 rows.

Cost is a single hash shuffle of |L|+|R| rows plus a per-partition sort —
the same cost profile as a regular sort-merge join, independent of how many
right rows precede each left row. At 100 TB this partitions by key exactly
like any other shuffle (skewed hot keys are handled by AQE or pre-salting
upstream); there is no broadcast requirement and no candidate blow-up.

Ordering note: with ``allow_exact_match=True`` a right row at exactly the
left row's timestamp is visible (right sorts first via side 0<1, i.e.
``r.ts <= l.ts``); with ``False`` the left row sorts first (``r.ts < l.ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
    allow_exact_match: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with the same ``on`` key and ``right_time`` <= (or <) ``left_time``.

    Left-join semantics: left rows with no prior right row get nulls.
    ``right_tiebreak`` makes the pick deterministic when several right rows
    share a timestamp (the max-tiebreak row wins).
    """
    lstruct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    null_l = F.lit(None).cast(
        "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema) + ">"
    ).alias("_l")

    # ALL value columns travel in ONE struct carried by a single
    # last(ignorenulls): carrying columns independently would stitch fields
    # from DIFFERENT right rows whenever a newer right row has a legitimate
    # NULL in one value column (a struct of nulls is itself non-null, so the
    # whole latest row wins or loses atomically).
    rtype = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        )
        + ">"
    )
    rstruct = F.struct(*[F.col(c) for c in value_cols]).alias("_r")
    null_r = F.lit(None).cast(rtype).alias("_r")

    tb_left = (
        F.lit(None).cast(right.schema[right_tiebreak].dataType)
        if right_tiebreak
        else F.lit(0)
    ).alias("_tb")
    tb_right = (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias("_tb")

    tagged_left = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        tb_left,
        lstruct,
        null_r,
    )
    tagged_right = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        tb_right,
        null_l,
        rstruct,
    )

    # side ordering encodes the <= vs < boundary at equal timestamps.
    side_order = F.col("_side").asc() if allow_exact_match else F.col("_side").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), side_order, F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = tagged_left.unionByName(tagged_right).withColumn(
        "_r", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        "_l.*", *[F.col(f"_r.{c}").alias(f"{prefix}{c}") for c in value_cols]
    )


def asof_self_join(
    source: DataFrame,
    on: str,
    time: str,
    left_pred: F.Column,
    right_pred: F.Column,
    left_cols: list[str],
    value_cols: list[str],
    right_tiebreak: str | None = None,
    allow_exact_match: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """``asof_join`` specialized for the common case where BOTH sides are
    predicates over the SAME relation (e.g. purchase vs view rows of one
    events table). ``asof_join(df.filter(p), df.filter(q), ...)`` plans TWO
    scans of the source — Spark has no cross-subtree CSE, so the union
    re-reads (and at 100 TB re-decodes) the full table once per side. Here
    the union is replaced by ONE scan filtered to ``left_pred OR
    right_pred`` with the side tag and the left/right payload structs built
    conditionally per row, which halves scan I/O while producing the exact
    union-tag-window relation ``asof_join`` would have built (equivalence
    pinned in tests/test_analytics_ops.py). The window semantics — one
    shuffle on the key, ``last(value, ignorenulls)`` carry-forward, the
    ``allow_exact_match`` boundary encoding — are identical.

    Rows satisfying BOTH predicates act as both a left and a right row in
    ``asof_join``; that needs two physical rows, so callers must pass
    disjoint predicates (asserted cheaply here via a lit check being
    impossible — documented contract instead: the one caller filters on
    distinct values of one column).
    """
    lstruct = F.struct(*[F.col(c) for c in left_cols])
    rstruct = F.struct(*[F.col(c) for c in value_cols])
    tb = (
        F.when(right_pred, F.col(right_tiebreak))
        if right_tiebreak
        else F.when(right_pred, F.lit(0))
    )
    tagged = source.filter(left_pred | right_pred).select(
        F.col(on).alias("_k"),
        F.col(time).alias("_t"),
        F.when(left_pred, F.lit(1)).otherwise(F.lit(0)).alias("_side"),
        tb.alias("_tb"),
        F.when(left_pred, lstruct).alias("_l"),
        F.when(right_pred, rstruct).alias("_r"),
    )

    side_order = F.col("_side").asc() if allow_exact_match else F.col("_side").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), side_order, F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return carried.filter(F.col("_side") == 1).select(
        "_l.*", *[F.col(f"_r.{c}").alias(f"{prefix}{c}") for c in value_cols]
    )
