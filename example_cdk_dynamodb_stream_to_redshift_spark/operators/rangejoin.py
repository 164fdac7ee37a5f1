"""Binned range joins — the scale path for interval predicates with no
equi-key.

Spark executes a bare range predicate (``l.start <= r.t AND r.t <=
l.end``) as BroadcastNestedLoopJoin: O(|L|·|R|) comparisons, the plan
that falls over first at corpus scale. The standard fix (the published
range-join optimization in Databricks Runtime and the interval-join
design in Flink) is BINNING: quantize time into fixed-width bins, turn
the range predicate into an equi-join on the bin id, and keep the exact
predicate as a join residual. The cartesian never materializes; the
shuffle is keyed by (optional equi keys, bin) — tunable fan-out via
``bin_width``:

- too small: long intervals explode into many bin rows (fan-out
  ∝ interval_len / bin_width);
- too large: many false candidates reach the residual filter.
  Rule of thumb: bin_width ≈ the typical interval length.

Dedup is by construction, not by a distinct shuffle:

- point-in-interval: a point lives in exactly ONE bin, so each
  qualifying (point, interval) pair meets exactly once.
- interval-overlap: two intervals share every bin they both cover; the
  pair is kept only in the FIRST shared bin
  (``bin == greatest(floor(l_start/W), floor(r_start/W))``), the
  canonical one-bin-per-pair rule — no DISTINCT, no second shuffle.

Reference tie-in: the engine's as-of join (operators/asof.py) covers
"latest earlier event"; this covers the other temporal-join family the
reference's event streams invite (events inside maintenance/incident
windows, overlapping sessions). Both DuckDB-expressible, so the
operators are oracle-registrable when a driver-window slot frees up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_width(bin_width: int) -> None:
    # pmod(x, 0) is NULL in non-ANSI Spark, so width<=0 would silently
    # NULL every bin key and both joins would return zero rows — make
    # the misconfiguration loud instead
    if not isinstance(bin_width, int) or bin_width < 1:
        raise ValueError(f"bin_width must be a positive int, got {bin_width!r}")


def _bin(col: Column, width: int) -> Column:
    # the bin id is the bin START: x - pmod(x, W) — exact int64 floor
    # alignment with NO division at all (the r7 formulation divided the
    # aligned value back down through decimal(38,0), ~2x the expression
    # cost for an id whose absolute value never matters). Double `/` on
    # long domains can land within an ulp of a bin boundary and mis-bin
    # (the repo-wide no-float-division-on-longs rule); pmod keeps
    # negatives on floor semantics where `%` would truncate toward zero.
    # Consumers treat bins as opaque equal-join keys and enumerate an
    # interval's bins with sequence(start_bin, end_bin, step=W).
    c = col.cast("long")
    return c - F.pmod(c, F.lit(width))


def _interval_bins(start: Column, end: Column, width: int) -> Column:
    """The bins a closed interval covers: sequence(bin(start), bin(end),
    step=width). A REVERSED interval (end < start) is an EMPTY interval
    and yields no bins — without the guard, sequence() with an explicit
    positive step raises on descending boundaries, so one malformed row
    in unvalidated event data would kill the whole job instead of
    contributing zero matches (r8 review finding)."""
    # the guard compares the RAW endpoints, not bin starts: a reversed
    # interval that collapses into a single bin (bin(s) == bin(e)) would
    # otherwise still emit that bin, and the overlap residual (written
    # for well-formed intervals) can pass it through as a phantom pair
    return F.when(
        start.cast("long") <= end.cast("long"),
        F.sequence(_bin(start, width), _bin(end, width), F.lit(width)),
    ).otherwise(F.array().cast("array<long>"))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    keys: list[str] | None = None,
    inclusive_end: bool = True,
) -> DataFrame:
    """All (point, interval) rows with ``start <= point <= end`` (or
    ``< end`` when ``inclusive_end=False``), optionally also matching on
    ``keys``. Output: the point row's columns plus the interval row's
    (caller aliases collisions beforehand).

    Plan: points carry ONE bin id; intervals posexplode into the bins
    they cover (``sequence(bin(s), bin(e), step=W)`` — fan-out bounded
    by interval length / W); hash equi-join on (keys..., bin) with the
    exact range check as a residual. Each qualifying pair meets in the
    point's single bin, so no dedup pass exists in the plan."""
    _check_width(bin_width)
    keys = keys or []
    p = points.withColumn("_bin", _bin(F.col(point_col), bin_width))
    iv = intervals.withColumn(
        "_bin",
        F.explode(_interval_bins(F.col(start_col), F.col(end_col), bin_width)),
    )
    upper = (
        F.col(point_col) <= F.col(end_col)
        if inclusive_end
        else F.col(point_col) < F.col(end_col)
    )
    joined = p.join(iv, [*keys, "_bin"]).filter(
        (F.col(start_col) <= F.col(point_col)) & upper
    )
    return joined.drop("_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """All (left, right) interval pairs that OVERLAP: ``l_start <= r_end
    AND r_start <= l_end`` (closed intervals), optionally also matching
    on ``keys``. Column names must not collide across sides (caller
    aliases beforehand).

    Plan: both sides posexplode into covered bins, hash equi-join on
    (keys..., bin), exact overlap check as a residual, and the
    first-shared-bin rule keeps each pair exactly once — dedup is a
    comparison in the residual, never a DISTINCT exchange over the
    (larger) pair set."""
    _check_width(bin_width)
    keys = keys or []
    lb = left.withColumn(
        "_bin", F.explode(_interval_bins(F.col(l_start), F.col(l_end), bin_width))
    )
    rb = right.withColumn(
        "_bin", F.explode(_interval_bins(F.col(r_start), F.col(r_end), bin_width))
    )
    first_shared = F.greatest(
        _bin(F.col(l_start), bin_width), _bin(F.col(r_start), bin_width)
    )
    joined = (
        lb.join(rb, [*keys, "_bin"])
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bin") == first_shared)
        )
    )
    return joined.drop("_bin")
