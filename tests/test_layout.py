"""Z-order layout (operators/layout.py): key math and the actual pruning
win, measured against real parquet footer min-max statistics."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pa_pq
import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import layout as L


def _grid(spark, n=64):
    # n x n grid of (x, y): every x occurs with every y, so a single-axis
    # sort can NEVER localize the other axis
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> int:
    """How many parquet files COULD contain col in [lo, hi] per their
    footer min-max stats — exactly the pruning decision a scan makes."""
    hit = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pa_pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1
    return hit


def test_grid_scale_exact_endpoints(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
    got = [
        r["g"]
        for r in df.select(
            L.grid_scale(F.col("v"), 0, 100, 4).alias("g")
        ).collect()
    ]
    # ((v - 0) * 15) div 100: 0 -> 0, 50 -> 7, 100 -> 15
    assert got == [0, 7, 15]


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (2, 1)], "x long, y long")
    got = [
        r["z"]
        for r in df.select(
            L.morton_interleave(F.col("x"), F.col("y"), bits=2).alias("z")
        ).collect()
    ]
    # x bits at even positions, y at odd: (3,0)->0b0101, (0,3)->0b1010,
    # (3,3)->0b1111, (2,1)->0b0110
    assert got == [5, 10, 15, 6]


def test_zorder_prunes_both_axes(spark, tmp_path):
    grid = _grid(spark)
    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x")
    L.zorder_write(grid, zpath, "x", "y", bits=6, n_files=16)
    # baseline: classic single-axis sort layout
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    # filter on x alone: both layouts prune (z is coarser but still local)
    zx = _files_overlapping(zpath, "x", 0, 7)
    xx = _files_overlapping(xpath, "x", 0, 7)
    assert xx <= 2
    assert zx <= 8  # a 1/8 x-slab touches at most half the z-files

    # filter on y alone: the x-sorted layout reads EVERYTHING, z prunes
    zy = _files_overlapping(zpath, "y", 0, 7)
    xy = _files_overlapping(xpath, "y", 0, 7)
    assert xy == 16
    assert zy <= 8
    assert zy < xy


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    grid = _grid(spark, n=16)
    path = str(tmp_path / "z")
    L.zorder_write(grid, path, "x", "y", bits=4, n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 256
    assert set(back.columns) == {"x", "y", "payload", "zkey"}
    assert (
        back.select(F.countDistinct("payload").alias("n")).first()["n"] == 256
    )


def test_degenerate_single_value_axis(spark):
    df = spark.createDataFrame([(5, 1), (5, 2)], "x long, y long")
    rows = L.zorder_key(df, "x", "y", bits=4).collect()
    # x has zero span -> gx = 0 for all rows; keys come from y alone:
    # y=1 -> gy=0 -> z=0; y=2 -> gy=15 (0b1111 at odd bits) -> 2+8+32+128
    assert [r["zkey"] for r in sorted(rows, key=lambda r: r["y"])] == [0, 170]
