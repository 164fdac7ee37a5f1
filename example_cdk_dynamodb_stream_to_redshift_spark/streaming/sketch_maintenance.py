"""Incrementally maintained KMV distinct-count sketches — the streaming
side of ``operators/sketches.py``.

A 100 TB ingest pipeline wants "distinct users / content fingerprints
seen to date, by shard" as a dashboard read, without ever rescanning
history. The KMV sketch makes that maintenance trivially correct:
min-k(A ∪ B) == min-k(min-k(A) ∪ min-k(B)), so each micro-batch is
sketched in isolation (one Arrow partial pass over the batch only) and
merged into the tiny persisted sketch table. Two properties fall out of
the algebra rather than from bookkeeping:

- **Replay idempotence for free.** Merging the same batch twice is a
  no-op (set union), so a foreachBatch retry after a crash needs NO
  batch-id replay guard — unlike the corpus store's batch-scoped
  overwrites or the Bloom sidecar's OR-maintenance, both of which are
  also idempotent but by construction, not by algebra.
- **Exactness relative to batch boundaries.** The maintained sketch is
  bit-identical to sketching the union of all batches directly (pinned
  in tests/test_sketch_maintenance.py), so micro-batch sizing never
  changes the answer.

Persistence is the repo's sidecar idiom (streaming/corpus.py Bloom
sidecar): versioned snapshot directories under the store plus a CURRENT
pointer file updated by tmp + atomic ``os.replace`` — a crash mid-commit
leaves the previous snapshot readable, never a torn table. The sketch
table is kilobytes per shard (k hashes), so snapshots are cheap at any
corpus size.

Reference tie-in: the reference's sync-run log (sql/sync_members.sql
lag observability) generalized from row counts to distinct-cardinality
observability over the stream.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import kmv_estimate, kmv_merge, kmv_sketches


class KmvSketchMaintenance:
    """Maintain per-shard KMV sketches of ``value_col`` across
    micro-batches. Wire ``apply_batch`` into a foreachBatch (alongside
    the main merge) or call it per refresh; read ``sketches()`` /
    ``estimates()`` anytime without touching the ingested data. Reader
    isolation spans one commit cycle: cleanup retains the committed
    snapshot's immediate predecessor, so a DataFrame bound before a
    concurrent commit still collects; hold it across several commits
    and it must be re-read."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        shard_cols: list[str],
        value_col: str,
        k: int = 256,
    ) -> None:
        self.spark = spark
        self.store_dir = store_dir
        self.shard_cols = list(shard_cols)
        self.value_col = value_col
        self.k = k
        self._pointer = os.path.join(store_dir, "CURRENT")

    # -- snapshot plumbing ------------------------------------------------

    def _current(self) -> tuple[str, int] | None:
        """(snapshot_path, version) the pointer names, or None before the
        first commit. A pointer to a missing snapshot is a loud error —
        silently restarting from empty would under-count forever."""
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as fh:
            name = fh.read().strip()
        path = os.path.join(self.store_dir, name)
        if not os.path.isdir(path):
            raise ValueError(
                f"sketch store pointer names missing snapshot {name!r} "
                f"under {self.store_dir} — restore the snapshot or delete "
                "the store to rebuild from scratch"
            )
        return path, int(name.split("=", 1)[1])

    # -- public API -------------------------------------------------------

    def apply_batch(self, batch_df: DataFrame) -> None:
        """Sketch ONE micro-batch (the only pass over batch data) and
        merge it into the store under a new snapshot + pointer flip.
        Safe to replay: re-merging an already-merged batch changes
        nothing (min-k union is idempotent)."""
        batch_sk = kmv_sketches(
            batch_df, self.shard_cols, self.value_col, self.k
        )
        cur = self._current()
        if cur is None:
            merged, version = batch_sk, 0
        else:
            path, v = cur
            merged = kmv_merge(
                self.spark.read.parquet(path).unionByName(batch_sk),
                self.shard_cols,
                self.k,
            )
            version = v + 1
        name = f"v={version}"
        new_dir = os.path.join(self.store_dir, name)
        # sketch tables are kilobytes/shard: one file per snapshot
        merged.coalesce(1).write.mode("overwrite").parquet(new_dir)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(name)
        os.replace(tmp, self._pointer)  # atomic commit point
        # post-commit cleanup KEEPS the immediate predecessor: a reader
        # that bound sketches()/estimates() to the previous snapshot (its
        # parquet file index resolves at plan time) must be able to
        # collect across ONE concurrent commit; only older snapshots go.
        # Readers are thus isolated for one commit cycle — a bound
        # DataFrame older than that must be re-read.
        for d in os.listdir(self.store_dir):
            tail = d.split("=", 1)[1] if d.startswith("v=") else ""
            # digits-only guard: foreign directories must not raise
            # mid-commit (the partitioned-store null-key lesson)
            if tail.isdigit() and int(tail) < version - 1:
                shutil.rmtree(
                    os.path.join(self.store_dir, d), ignore_errors=True
                )

    def sketches(self) -> DataFrame:
        """The maintained (shard_cols..., sketch) table. Raises before the
        first apply_batch — the merge.py abort-if-no-initial-load posture
        (a dashboard silently reading an empty store would report zero
        reach, not 'not yet loaded')."""
        cur = self._current()
        if cur is None:
            raise ValueError(
                f"no sketch snapshot committed yet under {self.store_dir}; "
                "run apply_batch first"
            )
        return self.spark.read.parquet(cur[0])

    def estimates(self, group_cols: list[str] | None = None) -> DataFrame:
        """Distinct-count estimates from the store alone (regrouped by
        ``group_cols``, or per stored shard when None)."""
        return kmv_estimate(
            self.sketches(),
            self.k,
            group_cols=self.shard_cols if group_cols is None else group_cols,
        )
