"""Key-bucketed partitioned table store + partition-scoped CDC merge.

`storage.ParquetTable` commits a full rewrite per merge — correct, atomic,
and fine while the target is micro-batch-sized. At 100 TB the rewrite itself
is the bottleneck: a micro-batch touching 10k keys must not rewrite 10^12
rows. The standard pre-lakehouse answer (and what Delta/Iceberg do under the
hood with finer granularity) is to partition the table by a hash bucket of
the merge key and rewrite ONLY the buckets containing staged keys:

- layout: ``root/_kb=<pmod(xxhash64(key), N)>/part-*.parquet`` — a stable
  directory per key bucket (Hive-style partitioning, partition-pruned reads);
- merge: stage the micro-batch (operators.merge.stage_changes — unchanged),
  collect its distinct bucket ids (≤ N tiny ints), prune the target scan to
  those buckets, run the same anti-join+union merge on that slice, and
  commit with **dynamic partition overwrite** so untouched buckets' files
  are never opened, let alone rewritten.

Cost per micro-batch: read+write of touched buckets only ≈
|batch keys| / N of the table (vs 100% for the full rewrite). N trades
merge I/O against small-file pressure; at cluster scale pick N so a bucket
≈ a few GB.

Semantics are identical to `incremental_merge` on the whole table — proven
in tests/test_partitioned_merge.py by running both paths on the same event
sequences, plus asserting untouched buckets' files are byte-identical.
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .merge import MergeSpec, incremental_merge

BUCKET_COL = "_kb"


def key_bucket(key_col: str, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


class PartitionedParquetTable:
    """Hash-bucket-partitioned parquet table keyed for partition-scoped
    merges. Readers see the logical schema (bucket column stripped)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_col: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.key_col = key_col
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    def _is_empty(self) -> bool:
        return not glob.glob(os.path.join(self.root, f"{BUCKET_COL}=*"))

    def _read_raw(self) -> DataFrame:
        """Logical columns + the ``_kb`` PARTITION column (from the
        directory name — filters on it become PartitionFilters, i.e. real
        directory pruning, unlike a recomputed hash-of-key predicate which
        would scan every bucket)."""
        raw_schema = T.StructType(
            list(self.schema.fields) + [T.StructField(BUCKET_COL, T.IntegerType())]
        )
        if self._is_empty():
            return self.spark.createDataFrame([], raw_schema)
        return (
            self.spark.read.schema(raw_schema)
            .option("basePath", self.root)
            .parquet(self.root)
        )

    def read(self) -> DataFrame:
        return self._read_raw().select(*[f.name for f in self.schema.fields])

    def _write(self, df: DataFrame) -> None:
        """Dynamic partition overwrite: only partitions present in ``df``
        are replaced on disk."""
        (
            df.withColumn(BUCKET_COL, key_bucket(self.key_col, self.n_buckets))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(self.root)
        )

    def overwrite_full(self, df: DataFrame) -> None:
        self._write(df)

    def append(self, df: DataFrame) -> None:
        # append within touched buckets = merge of (existing ∪ new) rows;
        # existing rows come from a partition-pruned read of touched buckets
        touched = self._touched_buckets(df)
        cols = [f.name for f in self.schema.fields]
        existing = (
            self._read_raw()
            .filter(F.col(BUCKET_COL).isin(touched))
            .select(*cols)
        )
        self._write(existing.unionByName(df.select(*cols)))

    def _touched_buckets(self, staged: DataFrame) -> list[int]:
        # the null flag rides the same distinct job: a NULL merge key
        # hashes to the seed bucket (xxhash64(NULL)=42) and would silently
        # merge all null-key rows under one phantom key — fail instead,
        # before anything is written
        rows = (
            staged.select(
                key_bucket(self.key_col, self.n_buckets).alias(BUCKET_COL),
                F.col(self.key_col).isNull().alias("_nullkey"),
            )
            .distinct()
            .collect()
        )
        if any(r["_nullkey"] for r in rows):
            raise ValueError(
                f"staged rows have NULL merge key {self.key_col!r}: "
                "merge keys must be non-null"
            )
        return [r[BUCKET_COL] for r in rows]

    def compact(self, buckets: list[int] | None = None) -> None:
        """Per-bucket small-files compaction: rewrite the given buckets
        (default: all) with one task per bucket, so each partition
        directory collapses to ~1 file. Every merge/append rewrites its
        touched buckets with task-count files; after thousands of
        micro-batches the scan cost is footer-opens, not bytes. Dynamic
        partition overwrite keeps the rewrite bucket-scoped and atomic
        per directory; untouched buckets are never read or written."""
        if self._is_empty():
            return
        raw = self._read_raw()
        if buckets is not None:
            if not buckets:
                return
            raw = raw.filter(F.col(BUCKET_COL).isin(buckets))
        cols = [f.name for f in self.schema.fields]
        self._write(
            raw.select(*cols).repartition(
                self.n_buckets, key_bucket(self.key_col, self.n_buckets)
            )
        )

    def _staging_dir(self) -> str:
        return os.path.join(self.root, "_staging")

    def _commit_manifest(self) -> str:
        # lives NEXT TO _staging, not inside it: its existence must mean
        # "the staging write fully succeeded and the move loop started or
        # was about to" — writing it inside _staging would race the
        # parquet committer's own directory lifecycle
        return os.path.join(self.root, "_staging_commit.json")

    def _commit_moves(self, touched: list[int], staged_buckets: set[int]) -> None:
        """The directory-commit move loop, written to be IDEMPOTENT so a
        crashed commit rolls FORWARD on the next merge: a staged bucket
        whose staging directory is gone was already moved (skip — its live
        directory holds the replacement); one still in staging is
        (re)committed by dropping the live directory and moving the
        replacement in; a touched bucket never staged lost all its rows
        and its live directory is removed (rmtree is a no-op if already
        gone)."""
        staging = self._staging_dir()
        for b in touched:
            dst = os.path.join(self.root, f"{BUCKET_COL}={b}")
            src = os.path.join(staging, f"{BUCKET_COL}={b}")
            if b in staged_buckets:
                if os.path.isdir(src):
                    shutil.rmtree(dst, ignore_errors=True)
                    shutil.move(src, dst)
            else:
                shutil.rmtree(dst, ignore_errors=True)

    def _roll_forward(self) -> None:
        """Complete a torn directory commit left by a crash. Without this,
        a crash between a bucket's rmtree(dst) and its shutil.move lost
        that bucket's non-staged rows permanently (replay only restores
        the micro-batch's keys): the old entry path unconditionally
        deleted ``_staging`` — discarding the fully-materialized
        replacement that could have rolled the commit forward. Now the
        commit manifest (written only AFTER the staging write fully
        succeeds) records the touched/staged bucket sets; if it exists on
        entry, the idempotent move loop re-runs to completion before the
        staging area is cleared. A crash BEFORE the manifest exists means
        no live directory was touched, so discarding ``_staging`` is
        safe, as before."""
        manifest = self._commit_manifest()
        # a crash DURING the tmp write leaves only the tmp file (the
        # replace never ran => pre-commit); drop it so it can't shadow a
        # later merge's own tmp
        tmp = manifest + ".tmp"
        if os.path.exists(tmp):
            os.remove(tmp)
        if os.path.exists(manifest):
            try:
                with open(manifest) as fh:
                    pending = json.load(fh)
            except json.JSONDecodeError:
                # belt over the atomic-rename braces: the manifest is
                # written tmp+os.replace so a torn file should be
                # impossible, but if one ever appears (filesystem without
                # atomic rename, manual copy) treat it as PRE-commit — no
                # live directory was touched before the manifest became
                # readable, so discarding staging+manifest is the safe
                # branch, same as the no-manifest case (the storage.py
                # _current_version torn-JSON posture). Only DECODE errors
                # take this branch: an OSError (EIO, EACCES) can hit a
                # COMPLETE manifest — possibly with _commit_moves already
                # partially run — and discarding staging there would lose
                # the touched buckets' non-staged rows, the exact loss the
                # protocol exists to prevent. Transient I/O must fail-stop
                # (propagate) so a retry can still roll forward.
                os.remove(manifest)
                shutil.rmtree(self._staging_dir(), ignore_errors=True)
                return
            self._commit_moves(pending["touched"], set(pending["staged"]))
            os.remove(manifest)
        shutil.rmtree(self._staging_dir(), ignore_errors=True)

    def merge(
        self,
        extract: DataFrame,
        spec: MergeSpec,
        sync_ts: dt.datetime | None = None,
        initial_load_guard: bool = True,
        stats: dict | None = None,
        watermark: dt.datetime | None = None,
    ) -> list[int]:
        """Partition-scoped CDC merge; returns the touched bucket ids.

        The watermark/staging/dedup/anti-join logic is the SAME
        `incremental_merge` as the full-rewrite path — only the target slice
        it runs against and the commit scope differ. ``stats`` (optional
        dict) receives the same merge diagnostics as ``incremental_merge``;
        here the deleted-count semi-join runs against the bucket-pruned
        slice only.

        ``watermark``, when given, skips the per-refresh MAX(ts) scan of
        the WHOLE target (the one un-pruned read this path had left): a
        long-lived caller carries ``stats["next_watermark"]`` from one
        refresh to the next and only pays the table read on cold start —
        see CdcPipeline. At 100 TB that turns a per-refresh O(table) job
        into O(1) driver state, with identical replay semantics (restart
        falls back to the in-table watermark, ST2).
        """
        from .merge import _EPOCH, read_watermark, stage_changes

        # complete any torn directory commit from a crashed predecessor
        # BEFORE reading the target — the read must see the rolled-forward
        # state, not a half-committed tear
        self._roll_forward()
        raw = self._read_raw()
        cols = [f.name for f in self.schema.fields]
        # per-phase wall clock, recorded into stats["merge_phase_sec"] so a
        # drift in one entity's merge time decomposes (watermark read /
        # staged agg / staging write / directory commit)
        import time as _time

        _phase: dict[str, float] = {}
        _t = _time.perf_counter()
        if watermark is None:
            watermark = read_watermark(raw)
        _phase["watermark_read"] = round(_time.perf_counter() - _t, 4)
        if watermark is None or watermark == _EPOCH:
            if initial_load_guard:
                # same ST8 behavior as the full-rewrite path
                raise ValueError(
                    f"initial load has not been performed for {spec.name}: "
                    "watermark is NULL/epoch"
                )
            watermark = _EPOCH

        from .merge import staged_prefilter

        staged = stage_changes(extract, spec, watermark)
        staged.persist()
        if stats is not None:
            stats["merge_phase_sec"] = _phase
        try:
            _t = _time.perf_counter()
            # Touched buckets + null-key guard from the PRE-dedup staged
            # frame (r14): both are invariant under the latest-per-key
            # window (it keeps ≥1 row per key), so this job is a plain
            # scan+aggregate of the cached micro-batch — no window
            # shuffle. The staged/inserted counts and the carried
            # watermark DO depend on the dedup; they ride the staging
            # write action as an observation (incremental_merge's
            # _defer_staged_counts), so the window work runs exactly
            # once, inside the write. Failing on a NULL key here is
            # still strictly before anything is written.
            row = staged_prefilter(extract, spec, watermark).agg(
                F.collect_set(
                    key_bucket(self.key_col, self.n_buckets)
                ).alias("bk"),
                # NULL merge keys hash to the seed bucket and would
                # silently collapse under one phantom key — fail instead
                F.count(
                    F.when(F.col(self.key_col).isNull(), 1)
                ).alias("nullk"),
            ).first()
            if row["nullk"]:
                raise ValueError(
                    f"{row['nullk']} staged row(s) have NULL merge key "
                    f"{self.key_col!r}: merge keys must be non-null"
                )
            touched = sorted(int(b) for b in row["bk"])
            _phase["staged_agg"] = round(_time.perf_counter() - _t, 4)
            if not touched:
                if stats is not None:
                    stats.update(
                        watermark=watermark,
                        next_watermark=watermark,
                        staged_count=0,
                        deleted_count=0,
                        inserted_count=0,
                    )
                return []
            # filter on the PARTITION column: directory-pruned read of the
            # touched buckets only (PartitionFilters, asserted in tests)
            pruned = raw.filter(F.col(BUCKET_COL).isin(touched)).select(*cols)
            if stats is not None:
                # staged/inserted counts + carried watermark ride the
                # staging write action (observation on the inserts branch)
                stats["_defer_staged_counts"] = True
            # watermark override: the pruned slice's max(ts) is NOT the
            # table watermark — pass the global one through.
            merged = incremental_merge(
                pruned,
                extract,
                spec,
                sync_ts,
                initial_load_guard=False,
                watermark=watermark,
                stats=stats,
            )
            # Stage `merged` to a TEMP directory first: it is lazily derived
            # from the very bucket files the commit below deletes/replaces,
            # and relying on the persist() cache surviving until the final
            # write is not safe on a real cluster (eviction / executor loss
            # would recompute from deleted files). The temp write fully
            # materializes the result while every source file is intact —
            # ALREADY LAID OUT per bucket (partitionBy), so the commit
            # below is pure metadata: surviving buckets come from the
            # staging directory listing (no distinct job) and each
            # directory moves into place (no second Spark write). The
            # merge is exactly ONE distributed action; on the bench
            # heartbeat this halved the straggler entity's merge wall.
            staging = self._staging_dir()
            shutil.rmtree(staging, ignore_errors=True)
            _t = _time.perf_counter()
            # Repartition BY BUCKET before the partitioned write (r13):
            # without it every upstream task (shuffle-width many) holds a
            # mix of buckets, so the dynamic-partition writer sorts each
            # task and opens a file per (task x bucket) — up to
            # width x |touched| tiny files per merge, whose open/commit
            # overhead dominated the refresh heartbeat (staging_write
            # 2.0s -> 0.47s measured on the 2k-event bench; ~16 files
            # instead of ~128 also cuts later scan and compaction cost).
            # At scale the trade is explicit: write parallelism becomes
            # one task per touched bucket, and n_buckets is picked so a
            # bucket is a few GB (module docstring) — set
            # spark.sql.files.maxRecordsPerFile if single-bucket files
            # must stay smaller.
            (
                merged.withColumn(
                    BUCKET_COL, key_bucket(self.key_col, self.n_buckets)
                )
                .repartition(self.n_buckets, F.col(BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(staging)
            )
            _phase["staging_write"] = round(_time.perf_counter() - _t, 4)
            if stats is not None:
                # the staging write above is the action the merge's pending
                # count observations ride on — resolve them now
                from .merge import finalize_merge_stats

                finalize_merge_stats(stats)
                mx = stats.pop("_staged_max_ts", None)
                stats.setdefault("watermark", watermark)
                stats["next_watermark"] = (
                    max(watermark, mx) if mx else watermark
                )
            _t = _time.perf_counter()
            try:
                # Every bucket in `merged` is in `touched` (survivors come
                # from touched buckets, inserts' keys are staged keys). A
                # touched bucket ABSENT from staging lost all its rows:
                # its directory is removed, not replaced. A crash
                # mid-commit leaves the watermark unmoved and rolls
                # FORWARD on the next merge: the manifest below (written
                # only after the staging write fully succeeded) lets
                # _roll_forward re-run the idempotent move loop, so no
                # bucket's non-staged rows are ever lost to a tear; the
                # replayed batch then re-applies idempotently (REMOVE of
                # an absent row is a no-op; re-inserts rewrite the same
                # values). If an emptied bucket held the global max event
                # time the watermark can move BACKWARD — harmless here
                # because the merge input is only this micro-batch.
                staged_dirs = [
                    d.split("=", 1)[1]
                    for d in os.listdir(staging)
                    if d.startswith(f"{BUCKET_COL}=")
                ]
                bad = [v for v in staged_dirs if not v.isdigit()]
                if bad:
                    # defense in depth: NULL keys are rejected at stage
                    # time above, so a non-integer partition value here
                    # (e.g. __HIVE_DEFAULT_PARTITION__) means something
                    # unexpected staged — fail BEFORE any live directory
                    # is touched (nothing is torn: no manifest yet, so
                    # staging is discarded and the batch errors cleanly)
                    raise ValueError(
                        f"merge staged non-integer {BUCKET_COL} partition(s) "
                        f"{bad} — refusing to commit"
                    )
                still_present = {int(v) for v in staged_dirs}
                # tmp + os.replace (the sketch-store pointer idiom): the
                # manifest is crash-RECOVERY state, so its own write must
                # be atomic — a torn half-written manifest would make the
                # next merge's _roll_forward die on JSONDecodeError and
                # block every merge until hand-repair. With the atomic
                # rename a manifest is visible iff it is complete.
                tmp = self._commit_manifest() + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(
                        {"touched": list(touched), "staged": sorted(still_present)},
                        fh,
                    )
                    fh.flush()
                    os.fsync(fh.fileno())
                os.replace(tmp, self._commit_manifest())
                self._commit_moves(touched, still_present)
                os.remove(self._commit_manifest())
            finally:
                # a live manifest means the move loop died mid-flight:
                # KEEP staging so the next merge rolls the commit forward
                # (deleting it here would recreate the data-loss tear the
                # manifest exists to prevent)
                if not os.path.exists(self._commit_manifest()):
                    shutil.rmtree(staging, ignore_errors=True)
                _phase["commit_move"] = round(_time.perf_counter() - _t, 4)
        finally:
            staged.unpersist()
        return touched
