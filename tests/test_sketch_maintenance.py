"""Maintained KMV sketches (streaming/sketch_maintenance.py): the
incrementally-merged store must equal the direct sketch of all data seen
(bit-identical, any batch slicing), replays must be no-ops by algebra,
and the pointer-file commit must tolerate leftover tmp state and refuse
a dangling pointer."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.sketches import (
    kmv_sketches,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.sketch_maintenance import (
    KmvSketchMaintenance,
)


def _data(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 3).alias("shard"), (F.col("id") % 700).alias("v")
    )


def _sk_map(df):
    return {r["shard"]: r["sketch"] for r in df.collect()}


def test_maintained_equals_direct_over_any_batching(spark, tmp_path):
    m = KmvSketchMaintenance(spark, str(tmp_path / "s"), ["shard"], "v", k=64)
    cuts = [(0, 400), (400, 401), (401, 1200), (1200, 2000)]  # ragged batches
    for lo, hi in cuts:
        m.apply_batch(_data(spark, lo, hi))
    direct = kmv_sketches(_data(spark, 0, 2000), ["shard"], "v", k=64)
    assert _sk_map(m.sketches()) == _sk_map(direct)
    ests = {r["shard"]: r["distinct_est"] for r in m.estimates().collect()}
    assert set(ests) == {0, 1, 2} and all(v > 0 for v in ests.values())


def test_replay_is_a_no_op_by_algebra(spark, tmp_path):
    m = KmvSketchMaintenance(spark, str(tmp_path / "s"), ["shard"], "v", k=64)
    m.apply_batch(_data(spark, 0, 500))
    m.apply_batch(_data(spark, 500, 900))
    before = _sk_map(m.sketches())
    m.apply_batch(_data(spark, 500, 900))  # crash-replayed micro-batch
    assert _sk_map(m.sketches()) == before


def test_read_before_first_commit_is_loud(spark, tmp_path):
    m = KmvSketchMaintenance(spark, str(tmp_path / "s"), ["shard"], "v", k=64)
    with pytest.raises(ValueError, match="no sketch snapshot"):
        m.sketches()


def test_dangling_pointer_is_loud_and_tmp_pointer_is_harmless(spark, tmp_path):
    store = str(tmp_path / "s")
    m = KmvSketchMaintenance(spark, store, ["shard"], "v", k=64)
    m.apply_batch(_data(spark, 0, 300))
    # leftover tmp from a crash BEFORE the atomic replace: ignored
    with open(os.path.join(store, "CURRENT.tmp"), "w") as fh:
        fh.write("v=999")
    before = _sk_map(m.sketches())
    m.apply_batch(_data(spark, 300, 600))
    assert _sk_map(m.sketches()) != before  # progressed normally
    # pointer to a deleted snapshot: loud, never silent-empty
    with open(os.path.join(store, "CURRENT"), "w") as fh:
        fh.write("v=999")
    with pytest.raises(ValueError, match="missing snapshot"):
        m.sketches()


def test_estimates_regroup_reads_only_the_store(spark, tmp_path):
    m = KmvSketchMaintenance(spark, str(tmp_path / "s"), ["shard"], "v", k=64)
    m.apply_batch(_data(spark, 0, 2000))
    (row,) = m.estimates(group_cols=[]).collect()
    # 700 distinct v globally, k=64 engaged: loose 4-sigma envelope
    assert abs(row["distinct_est"] - 700) / 700 < 0.5


def test_orphaned_snapshot_from_pre_pointer_crash_is_overwritten(spark, tmp_path):
    """A crash AFTER writing snapshot v=N+1 but BEFORE the pointer flip
    leaves an orphaned directory; the retry must overwrite it and commit
    normally (mode=overwrite on the snapshot write is the guarantee)."""
    store = str(tmp_path / "s")
    m = KmvSketchMaintenance(spark, store, ["shard"], "v", k=64)
    m.apply_batch(_data(spark, 0, 400))  # commits v=0
    # simulate the torn attempt: v=1 exists with garbage, pointer still v=0
    orphan = os.path.join(store, "v=1")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as fh:
        fh.write("torn write")
    m.apply_batch(_data(spark, 400, 900))  # retry of the same logical step
    assert open(os.path.join(store, "CURRENT")).read().strip() == "v=1"
    direct = kmv_sketches(_data(spark, 0, 900), ["shard"], "v", k=64)
    assert _sk_map(m.sketches()) == _sk_map(direct)


def test_reader_bound_before_a_commit_survives_it(spark, tmp_path):
    """Cleanup retains the predecessor snapshot: a DataFrame bound to
    v=N must still collect after the v=N+1 commit (one-commit reader
    isolation), and snapshots older than the predecessor are removed."""
    store = str(tmp_path / "s")
    m = KmvSketchMaintenance(spark, store, ["shard"], "v", k=64)
    m.apply_batch(_data(spark, 0, 300))          # v=0
    bound = m.sketches()                          # binds to v=0's files
    m.apply_batch(_data(spark, 300, 600))         # v=1 commits
    assert len(bound.collect()) > 0               # predecessor retained
    m.apply_batch(_data(spark, 600, 900))         # v=2 commits -> v=0 goes
    names = {d for d in os.listdir(store) if d.startswith("v=")}
    assert names == {"v=1", "v=2"}
