"""Z-order (Morton) data layout: multi-dimensional clustering for scan
pruning.

Parquet scans prune at two levels — partition directories and row-group/
file min-max statistics. A single-column sort localizes only that column:
a 100 TB fact table sorted by order key answers key-range probes cheaply
but scans EVERYTHING for a date-range or customer-range filter. Z-ordering
interleaves the bits of two (or more) grid-scaled columns into one sort
key, so files become axis-aligned rectangles in value space and min-max
stats prune meaningfully for filters on EITHER dimension — the layout
trick behind Databricks Delta's OPTIMIZE ZORDER and ClickHouse's
mortonEncode, public technique (Morton 1966).

Everything is exact integer math (bit-stable cross-engine and therefore
DuckDB-oracle-checkable): values grid-scale by ((x - min) * (2^bits - 1))
div (max - min) — integer div, no doubles — then bits interleave with
shift/and/or codegen expressions. The min/max bounds are 4 driver scalars.

Reference tie-in: the reference relies on Redshift's implicit sort keys
(compound, single-axis); this is the multi-axis layout its scan-heavy
queries (sql/queries.sql:22-45) would want at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_scale(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Exact integer scaling of ``col`` in [lo, hi] onto [0, 2^bits):
    ((x - lo) * (2^bits - 1)) div (hi - lo). The remainder is removed in
    long arithmetic, so the final division is an exact multiple and stays
    exact through the double divide as long as (hi - lo) * (2^bits - 1)
    < 2^53 — true for any real key domain at bits <= 20."""
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    m = (1 << bits) - 1
    scaled = (col.cast("long") - F.lit(int(lo))) * F.lit(m)
    # integer division: Spark's `div` operator via expr-free arithmetic —
    # (a - pmod(a, b)) / b stays exact in longs
    return (
        (scaled - F.pmod(scaled, F.lit(span))) / F.lit(span)
    ).cast("long")


def morton_interleave(gx: Column, gy: Column, bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of gx (even positions) and gy (odd
    positions) into one long — a flat chain of shift/and/add codegen ops."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(gx, i).bitwiseAND(F.lit(1)), 2 * i
        ) + F.shiftleft(
            F.shiftright(gy, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder_key(
    df: DataFrame, xcol: str, ycol: str, bits: int = 16
) -> DataFrame:
    """df + ``zkey``: the Morton code of (xcol, ycol) grid-scaled by the
    columns' actual min/max (one tiny aggregate job -> 4 driver scalars)."""
    b = df.agg(
        F.min(xcol).cast("long").alias("xlo"),
        F.max(xcol).cast("long").alias("xhi"),
        F.min(ycol).cast("long").alias("ylo"),
        F.max(ycol).cast("long").alias("yhi"),
    ).first()
    gx = grid_scale(F.col(xcol), b["xlo"], b["xhi"], bits)
    gy = grid_scale(F.col(ycol), b["ylo"], b["yhi"], bits)
    return df.withColumn("zkey", morton_interleave(gx, gy, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` z-clustered: range-partition on zkey (contiguous Morton
    rectangles per file) so every file's (xcol, ycol) min-max stats cover a
    tight box — the layout under which a filter on EITHER column prunes
    files/row-groups instead of scanning the world (asserted against
    parquet footer stats in tests/test_layout.py)."""
    (
        zorder_key(df, xcol, ycol, bits)
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
