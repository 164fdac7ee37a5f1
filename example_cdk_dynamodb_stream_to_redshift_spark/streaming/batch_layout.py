"""Batch-id directory layout with crash-safe compaction.

Every foreachBatch store in this engine uses the same idempotence
recipe: each micro-batch OVERWRITES its own ``batch_id=<n>``
subdirectory, so an at-least-once replay rewrites its own data instead
of appending duplicates. The cost is one directory (and a few files)
per micro-batch forever — the classic streaming small-files problem: at
one batch a minute, a year of ingestion is half a million directories
and the LISTING, not the data, dominates read planning.

``compact_root`` consolidates the layout into a single ``compact=<k>``
directory, crash-safe by construction:

1. the consolidated data is written to a hidden temp dir together with a
   ``_compacted_from.json`` marker naming every superseded directory;
2. the temp dir is atomically renamed into place (``os.replace``) — the
   marker and the data become visible together or not at all;
3. the superseded directories are deleted; readers honor markers, so the
   window between (2) and (3) never shows duplicate rows, and a re-run
   finishes any pending cleanup first.

Compacted rows keep their original ``batch_id`` as a DATA column, so
consumers that filter by batch (the replay guard's ``exclude_batch``)
keep working by value where the directory no longer exists. The
compactor reads exactly the source dirs it listed — a batch landing
mid-compaction is neither absorbed nor deleted. ``keep_last`` protects
the newest N batch dirs for stores where the streaming checkpoint may
still replay them (the CDC extract: only the last uncommitted batch can
ever be retried, so ``keep_last=2`` is already conservative).
"""

from __future__ import annotations

import glob as _glob
import json as _json
import os
import shutil as _shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def superseded(root: str) -> set[str]:
    """Basenames under ``root`` superseded by compaction markers — kept
    out of every read even while their deletion is still pending."""
    gone: set[str] = set()
    for marker in _glob.glob(
        os.path.join(root, "compact=*", "_compacted_from.json")
    ):
        try:
            with open(marker) as fh:
                gone.update(_json.load(fh)["superseded"])
        except (OSError, ValueError, KeyError):
            # unreadable marker = torn compact dir; ignore the dir itself
            gone.add(os.path.basename(os.path.dirname(marker)))
    return gone


def live_dirs(
    root: str, exclude_batch: int | None = None
) -> tuple[list[str], list[str]]:
    """(batch_dirs, compact_dirs) currently visible under ``root``."""
    gone = superseded(root)
    batch_dirs = [
        d
        for d in sorted(_glob.glob(os.path.join(root, "batch_id=*")))
        if os.path.basename(d) not in gone
        and (
            exclude_batch is None
            or not d.endswith(f"batch_id={exclude_batch}")
        )
    ]
    compact_dirs = [
        d
        for d in sorted(_glob.glob(os.path.join(root, "compact=*")))
        if os.path.basename(d) not in gone
    ]
    return batch_dirs, compact_dirs


def read_root(
    spark: SparkSession,
    root: str,
    empty_fields: list[T.StructField],
    exclude_batch: int | None = None,
) -> DataFrame:
    """Union of the live batch dirs (batch_id from partition discovery)
    and compacted dirs (batch_id as a stored column, still subject to the
    ``exclude_batch`` replay guard by VALUE). Empty DataFrame with the
    full schema when nothing has landed."""
    batch_dirs, compact_dirs = live_dirs(root, exclude_batch)
    parts = []
    if batch_dirs:
        parts.append(spark.read.option("basePath", root).parquet(*batch_dirs))
    if compact_dirs:
        dc = spark.read.parquet(*compact_dirs)
        if exclude_batch is not None:
            dc = dc.filter(F.col("batch_id") != exclude_batch)
        parts.append(dc)
    if not parts:
        return spark.createDataFrame([], T.StructType(empty_fields))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_batch_dir(
    df: DataFrame, dest: str, partition_by: list[str] | None = None
) -> None:
    """Overwrite ``dest`` (a ``batch_id=<n>`` dir) with ``df``, removing
    the partial directory if the write raises mid-flight.

    An in-plan data-contract error (e.g. the ANN store's wrong-dimension
    ``raise_error``) can fire AFTER the writer created the directory and
    some task files: the cheap ``isEmpty`` pre-probe stops at the first
    row, so a batch mixing valid rows with one violating row passes the
    probe and dies mid-write. The leftover file-less (or partial) dir
    would then be globbed into every later ``read_root`` and fail with
    UNABLE_TO_INFER_SCHEMA instead of the explanatory contract error
    (r12 advice). Removing it on failure is consistent with replay
    semantics: ``mode=overwrite`` had already discarded any previous
    contents of the dir, and the at-least-once retry re-lands the whole
    batch."""
    try:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(dest)
    except Exception:
        _shutil.rmtree(dest, ignore_errors=True)
        raise


def write_local_batch_dir(table, dest: str) -> None:
    """Overwrite ``dest`` (a ``batch_id=<n>`` dir) with a DRIVER-SIDE
    pyarrow parquet write of a bounded Arrow table — no Spark write job,
    no commit protocol. The _write_sync_log precedent generalized: a
    Spark write job costs ~0.3s of scheduling per micro-batch for
    kilobyte artifacts, which dominates the maintained-store heartbeat.
    Only for BOUNDED frames (checks x batches / cols x buckets / top-k
    summaries) already materialized on the driver; data-sized writes
    stay on the Spark writer. Replay idempotence is unchanged: stale
    parquet files are removed first, and the new file lands via an
    atomic rename so a reader never sees a torn file (Spark's committer
    gave file-level atomicity the same way)."""
    import pyarrow.parquet as _pq

    os.makedirs(dest, exist_ok=True)
    for old in os.listdir(dest):
        if old.endswith(".parquet"):
            os.remove(os.path.join(dest, old))
    tmp = os.path.join(dest, ".part-00000.parquet.tmp")
    try:
        _pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(dest, "part-00000.parquet"))
    except Exception:
        _shutil.rmtree(dest, ignore_errors=True)  # same as write_batch_dir
        raise


def cleanup_superseded(root: str) -> None:
    """Finish a prior crashed compaction's pending cleanup (idempotent):
    superseded dirs are already excluded from every read by their
    marker, but only deletion reclaims the disk."""
    for base in superseded(root):
        _shutil.rmtree(os.path.join(root, base), ignore_errors=True)


def compact_root(
    spark: SparkSession,
    root: str,
    target_partitions: int = 8,
    keep_last: int = 0,
    cluster_by: list[str] | None = None,
) -> bool:
    """Consolidate ``root``'s live layout into one ``compact=<k>`` dir
    (see module docstring for the crash-safety protocol). Returns True
    if a compaction ran, False if there was nothing to do."""
    if not os.path.isdir(root):
        return False
    cleanup_superseded(root)
    batch_dirs, compact_dirs = live_dirs(root)
    if keep_last:
        # protect the newest batch ids (numeric order, not lexicographic)
        batch_dirs = sorted(
            batch_dirs, key=lambda d: int(os.path.basename(d).split("=", 1)[1])
        )[: -keep_last or None]
    sources = batch_dirs + compact_dirs
    if len(sources) <= 1:
        return False
    # read EXACTLY the captured source dirs (not a re-glob: a micro-batch
    # landing mid-compaction must be neither absorbed nor deleted)
    parts = []
    if batch_dirs:
        parts.append(spark.read.option("basePath", root).parquet(*batch_dirs))
    if compact_dirs:
        parts.append(spark.read.parquet(*compact_dirs))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    write_compact(
        df, root, sources,
        target_partitions=target_partitions, cluster_by=cluster_by,
    )
    return True


def write_compact(
    df: DataFrame,
    root: str,
    sources: list[str],
    target_partitions: int = 8,
    cluster_by: list[str] | None = None,
) -> str:
    """Write ``df`` as the next ``compact=<k>`` directory under ``root``
    with a marker superseding ``sources``, following the module's
    crash-safety protocol (temp write + marker, atomic rename, then
    source deletion). ``df`` must already carry ``batch_id`` as a DATA
    column. ``k`` is one past the highest compact id ON DISK (superseded
    dirs pending deletion included), so a k collision is impossible even
    mid-cleanup. Returns the new directory path.

    This is the shared tail of ``compact_root``, public so stores whose
    consolidation TRANSFORMS rows (ClusterMaintenance.checkpoint applies
    the root-remap log while rewriting) reuse the exact same protocol
    instead of copying it."""
    next_k = (
        max(
            (
                int(os.path.basename(d).split("=", 1)[1])
                for d in _glob.glob(os.path.join(root, "compact=*"))
            ),
            default=-1,
        )
        + 1
    )
    tmp = os.path.join(root, f".compact_tmp_{next_k}")
    _shutil.rmtree(tmp, ignore_errors=True)
    # cluster_by: co-locate and sort rows on these columns so parquet
    # row-group min/max stats make later IN-filters on them selective
    # (the ClusterMaintenance bucketed-probe path)
    out = (
        df.repartition(target_partitions, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
        if cluster_by
        else df.repartition(target_partitions)
    )
    out.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_compacted_from.json"), "w") as fh:
        _json.dump({"superseded": [os.path.basename(d) for d in sources]}, fh)
    dest = os.path.join(root, f"compact={next_k}")
    os.replace(tmp, dest)
    for d in sources:
        _shutil.rmtree(d, ignore_errors=True)
    return dest


class ForeachBatchStore:
    """The chaining + compaction shape shared by EVERY foreachBatch
    store on this layout, single- or multi-root: ``wrap`` threads the
    unchanged batch to an inner sink after recording, ``compact``
    consolidates each root. Subclasses define ``process_batch`` and
    ``_store_roots``. Extracted so the recipe has exactly one
    implementation (r10 review: ClusterMaintenance and
    ShingleDocFreqStore had grown line-for-line copies — the same
    finding the r9 extraction fixed for the collect-path stores)."""

    spark: SparkSession

    def _store_roots(self) -> list[str]:
        raise TypeError(
            f"{type(self).__name__} must define _store_roots"
        )  # pragma: no cover - subclasses always override

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        raise TypeError(
            f"{type(self).__name__} must define process_batch"
        )  # pragma: no cover - subclasses always override

    def wrap(self, sink):
        """foreachBatch pass-through: record the batch's artifact, then
        hand the UNCHANGED batch to the inner sink — chainable with the
        quality gate: ``gate.wrap(store.wrap(sink))``."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id)
            sink(batch_df, batch_id)

        return _fn

    def compact(self, target_partitions: int = 8, keep_last: int = 2) -> None:
        for root in self._store_roots():
            if os.path.isdir(root):
                compact_root(
                    self.spark,
                    root,
                    target_partitions=target_partitions,
                    keep_last=keep_last,
                )


class MicroBatchStore(ForeachBatchStore):
    """The shared shape of every per-batch artifact store built on this
    layout (drift profiles, budget histograms): a tiny bounded frame is
    derived from each micro-batch, collected (the artifact is
    cols x buckets-sized, never data-sized), and written as a
    local-relation job into the batch's own ``batch_id=<n>`` directory;
    readers union the live layout; ``compact`` consolidates it.

    Subclasses define how the per-batch frame is computed (their
    ``process_batch`` calls ``_write_batch``) and expose their own
    typed readers over ``_read_store``. Extracted so the store recipe —
    write path, replay idempotence, compaction guard — has exactly one
    implementation (r9 review: ProfileMonitor and BudgetHistogram had
    copied it line-for-line)."""

    def __init__(self, spark: SparkSession, root: str, subdir: str) -> None:
        self.spark = spark
        self.root = root
        self._store_dir = os.path.join(root, subdir)

    def _store_roots(self) -> list[str]:
        return [self._store_dir]

    def _write_batch(self, frame: DataFrame, batch_id: int) -> None:
        """Materialize the bounded per-batch frame with ONE job
        (``toArrow`` — the Arrow collect path) and overwrite the batch's
        directory with a driver-side pyarrow write; overwrite makes
        at-least-once replay idempotent. The previous shape (collect +
        local-relation Spark write) paid a SECOND Spark job plus the
        commit protocol per micro-batch — pure scheduling overhead for
        kilobyte artifacts (r13, the _write_sync_log precedent)."""
        write_local_batch_dir(
            frame.toArrow(),
            os.path.join(self._store_dir, f"batch_id={batch_id}"),
        )

    def _read_store(self, fields: list[T.StructField]) -> DataFrame:
        return read_root(self.spark, self._store_dir, fields)

    def compact(self, target_partitions: int = 1, keep_last: int = 2) -> None:
        # kilobyte artifacts: one output file per store by default
        super().compact(
            target_partitions=target_partitions, keep_last=keep_last
        )
