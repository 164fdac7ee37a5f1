"""Micro-batch-maintained dedup clusters: incremental connected
components over a stream of near-dup edges, on the batch-id store
layout (streaming/batch_layout).

The batch form (operators/components.connected_components) recomputes
the transitive closure over EVERY edge ever seen; at 100 TB with a
steady trickle of new documents that is a full-history recompute per
micro-batch. This store instead keeps the closure MAINTAINED:

- ``nodes`` store — append-only ``(node, root)`` assignments, one row
  per node EVER, written once at first sighting and never rewritten
  (the heavy-hitter "landed data is never rescanned" posture, applied
  to cluster state);
- ``remaps`` store — the merge log: one ``(old_root, new_root)`` row
  per cluster-merge EVENT. Roots only ever decrease (min-id canonical
  convention), so the log is acyclic and each superseded root appears
  at most once as a source; the driver resolves chains
  (``5→4, 4→3 ⇒ 5→3``) with operators/components.resolve_remaps and
  the read path applies the resolved map with one broadcast join.

Per-batch cost is bounded by the BATCH, not the corpus: one broadcast
semi-join probe of the nodes store (the only corpus-sized touch — scan
yes, shuffle no; bucket the store by ``node`` on a real cluster and
the probe prunes too), a closure over the batch-contracted root graph
(≤ 2|E_batch| nodes, normally finishing in connected_components'
size-adaptive driver path), and batch-bounded artifact writes. Reads
(``clusters()``) are one nodes-store scan + one broadcast remap join —
no closure recomputation, ever.

Replay safety follows the shared recipe: each batch overwrites its own
``batch_id=<n>`` directories in BOTH stores, and the probe/remap reads
exclude the in-flight batch id (by directory, or by VALUE after
compaction), so an at-least-once retry recomputes against exactly the
pre-batch state. ``checkpoint()`` folds the remap log into the stored
assignments (crash-safe via batch_layout.write_compact), protecting
the newest ``keep_last`` batch directories the way ``compact_root``
does — a replayed batch that had already been folded would otherwise
land its node rows twice — and shrinks the log to the entries those
kept directories can still need.

Growth bounds, stated honestly: the nodes store is one row per
distinct endpoint ever (corpus-scale, distributed, append-only — the
artifact IS the answer, so this is the floor); the remap log is one
row per merge event, ≤ the number of roots ever superseded, kilobytes
in practice — and ``checkpoint()`` trims it back whenever it grows
past comfort.

Reference scope: the reference app (damc-dev/example-cdk-dynamodb-
stream-to-redshift) has no dedup surface; this extends the engine's
dedup family (minhash/simhash pair generators + batch CC) to the
streaming regime per the build brief.
"""

from __future__ import annotations

import json as _json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.components import incremental_step, resolve_remaps
from .batch_layout import (
    ForeachBatchStore,
    cleanup_superseded,
    live_dirs,
    read_root,
    write_compact,
)

NODE_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("node", T.LongType()),
    T.StructField("root", T.LongType()),
]
REMAP_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("old_root", T.LongType()),
    T.StructField("new_root", T.LongType()),
]


class ClusterMaintenance(ForeachBatchStore):
    """Maintain dedup-cluster assignments across micro-batches of
    near-dup edges (``src_col``/``dst_col`` node ids, castable to
    long). Components are canonicalized to their minimum node id, the
    same survivor convention as the batch operator, so the maintained
    result is comparable row-for-row with
    ``connected_components(all_edges_so_far)`` — the invariant
    tests/test_cluster_maintenance.py pins on random batch slicings."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        src_col: str = "src",
        dst_col: str = "dst",
        n_buckets: int | None = None,
    ) -> None:
        """``n_buckets``: opt-in probe pruning. When set, node rows
        carry ``b = pmod(node, n_buckets)``, files are clustered on it
        (batch writes sort within partitions; checkpoint's compact
        rewrite repartitions+sorts by it), and the per-batch probe adds
        ``b IN (<batch's buckets>)`` — a static filter parquet row-group
        stats can skip on, so a small batch reads only the store slices
        that can contain its endpoints instead of scanning everything.
        Size it well above the expected batch endpoint count (e.g. 4096
        for 1-2k-edge batches); equality with the unbucketed store is
        pinned in tests/test_cluster_maintenance.py."""
        if n_buckets is not None and n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        self.spark = spark
        self.src_col = src_col
        self.dst_col = dst_col
        self.n_buckets = n_buckets
        self._root = root
        self._meta_path = os.path.join(root, "_cluster_meta.json")
        self._nodes_dir = os.path.join(root, "_cluster_nodes")
        self._remaps_dir = os.path.join(root, "_cluster_remaps")
        self._check_meta()  # reopening with a different layout fails NOW

    def _check_meta(self, create: bool = False) -> None:
        """The bucket layout is part of the persisted state: reopening a
        store with a different ``n_buckets`` would mis-bucket the probe
        filter and silently re-land existing nodes as new (conflicting
        duplicate assignments), so the value is pinned in a marker file
        at creation and every open/write validates against it."""
        if os.path.isfile(self._meta_path):
            with open(self._meta_path) as fh:
                stored = _json.load(fh).get("n_buckets")
            if stored != self.n_buckets:
                raise ValueError(
                    f"cluster store at {self._root} was created with "
                    f"n_buckets={stored}; reopening with "
                    f"{self.n_buckets} would corrupt the maintained "
                    "state — match the original value or rebuild."
                )
            return
        # no meta file: a PRE-meta store must be validated structurally,
        # not trusted — stamping the caller's value over unknown landed
        # state would make a corrupted layout look validated forever
        nb, nc = live_dirs(self._nodes_dir)
        if nb or nc:
            cols = self.spark.read.parquet((nb + nc)[0]).columns
            if "b" in cols:
                raise ValueError(
                    f"cluster store at {self._root} predates the layout "
                    "marker and is BUCKETED with an unknown modulus; "
                    "rebuild it (or restore its _cluster_meta.json) "
                    "before reopening."
                )
            if self.n_buckets is not None:
                raise ValueError(
                    f"cluster store at {self._root} is unbucketed; "
                    f"reopening with n_buckets={self.n_buckets} would "
                    "corrupt the maintained state — open unbucketed or "
                    "rebuild."
                )
        if create or nb or nc:
            os.makedirs(self._root, exist_ok=True)
            tmp = self._meta_path + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump({"n_buckets": self.n_buckets}, fh)
            os.replace(tmp, self._meta_path)

    def _store_roots(self) -> list[str]:
        return [self._nodes_dir, self._remaps_dir]

    def compact(self, target_partitions: int = 8, keep_last: int = 2) -> None:
        """Small-files consolidation WITHOUT folding the remap log —
        safe, since stale roots in compacted rows still resolve through
        the untouched log; ``checkpoint()`` is the fold-and-trim form.
        Overridden (not inherited) so a bucketed store's rewrite keeps
        its files clustered on ``b`` (else every probe scans the whole
        store until the next checkpoint) and the kilobyte remap log
        stays one file."""
        from .batch_layout import compact_root

        compact_root(
            self.spark,
            self._nodes_dir,
            target_partitions=target_partitions,
            keep_last=keep_last,
            cluster_by=["b"] if self.n_buckets is not None else None,
        )
        compact_root(
            self.spark, self._remaps_dir,
            target_partitions=1, keep_last=keep_last,
        )

    def _node_fields(self) -> list[T.StructField]:
        if self.n_buckets is None:
            return NODE_FIELDS
        return NODE_FIELDS + [T.StructField("b", T.IntegerType())]

    def _bucket(self, col):
        return F.pmod(col, F.lit(int(self.n_buckets))).cast("int")

    # -- write path ---------------------------------------------------------
    def process_batch(self, edges_df: DataFrame, batch_id: int) -> None:
        """Fold one micro-batch of edges into the maintained state:
        probe current assignments for the batch's endpoints, close over
        the contracted batch graph, then write the two increments —
        first-sighting assignments (distributed write; batch-bounded)
        and merge events (collected; merge-event-bounded) — each into
        its own ``batch_id=<n>`` directory (overwrite = idempotent
        replay)."""
        self._check_meta(create=True)
        mapping = self._mapping(
            exclude_batch=batch_id, probe_edges=edges_df
        )
        step = incremental_step(
            edges_df, mapping, self.src_col, self.dst_col,
        ).localCheckpoint()  # two consumers below; one step computation
        new_nodes = step.filter(F.col("prev_root").isNull()).select(
            "node", "root"
        )
        if self.n_buckets is not None:
            new_nodes = new_nodes.withColumn(
                "b", self._bucket(F.col("node"))
            ).sortWithinPartitions("b")
        remaps = (
            step.filter(
                F.col("prev_root").isNotNull()
                & (F.col("prev_root") != F.col("root"))
            )
            .select(
                F.col("prev_root").alias("old_root"),
                F.col("root").alias("new_root"),
            )
            .distinct()
        )
        new_nodes.write.mode("overwrite").parquet(
            os.path.join(self._nodes_dir, f"batch_id={batch_id}")
        )
        # merge log rows are event-bounded — the tiny-frame local write
        rows = remaps.collect()
        self.spark.createDataFrame(rows, remaps.schema).write.mode(
            "overwrite"
        ).parquet(os.path.join(self._remaps_dir, f"batch_id={batch_id}"))

    # -- read path ----------------------------------------------------------
    def _remap_pairs(self, exclude_batch: int | None = None) -> list:
        df = read_root(
            self.spark, self._remaps_dir, REMAP_FIELDS, exclude_batch
        )
        return [(r["old_root"], r["new_root"]) for r in df.collect()]

    def _remap_frame(self, exclude_batch: int | None = None) -> DataFrame:
        return self._resolved_frame(self._remap_pairs(exclude_batch))

    def _resolved_frame(self, pairs: list) -> DataFrame:
        resolved = resolve_remaps(pairs)
        return self.spark.createDataFrame(
            list(resolved.items()) or [(None, None)],
            "old_root long, new_root long",
        ).filter(F.col("old_root").isNotNull())

    def _mapping(
        self,
        exclude_batch: int | None = None,
        probe_edges: DataFrame | None = None,
    ) -> DataFrame:
        nodes = read_root(
            self.spark, self._nodes_dir, self._node_fields(), exclude_batch
        )
        if self.n_buckets is not None and probe_edges is not None:
            # the batch touches at most |endpoints| buckets; collecting
            # the bucket VALUES (<= n_buckets ints) turns the probe into
            # a static IN-filter parquet row-group stats can skip on
            ends = (
                probe_edges.select(
                    F.col(self.src_col).cast("long").alias("n")
                )
                .union(
                    probe_edges.select(
                        F.col(self.dst_col).cast("long").alias("n")
                    )
                )
                .filter(F.col("n").isNotNull())
                .select(self._bucket(F.col("n")).alias("b"))
                .distinct()
            )
            buckets = [r["b"] for r in ends.collect()]
            # a batch touching most buckets gets no pruning from the
            # IN-filter — just a huge predicate; probe the full store then
            if len(buckets) <= self.n_buckets // 2:
                nodes = nodes.filter(F.col("b").isin(buckets))
        rm = self._remap_frame(exclude_batch)
        return nodes.join(
            F.broadcast(rm), nodes["root"] == rm["old_root"], "left"
        ).select(
            "node", F.coalesce("new_root", "root").alias("component")
        )

    def clusters(self) -> DataFrame:
        """Current ``(node, component)`` over everything landed —
        component = minimum reachable node id. One nodes-store scan plus
        one broadcast remap join; the closure is never recomputed."""
        return self._mapping()

    def assignments(self) -> DataFrame:
        """``(batch_id, node, component)`` — ``clusters()`` plus the
        batch each node first landed in, for lineage-style questions
        ("which ingest introduced this cluster member")."""
        nodes = read_root(self.spark, self._nodes_dir, self._node_fields())
        rm = self._remap_frame()
        return nodes.join(
            F.broadcast(rm), nodes["root"] == rm["old_root"], "left"
        ).select(
            "batch_id", "node", F.coalesce("new_root", "root").alias("component")
        )

    def cluster_sizes(self) -> DataFrame:
        """``(component, n_nodes)`` over the maintained assignment —
        the per-cluster duplication factor. Covers nodes that appeared
        in some edge (the store's population); edge-free singletons are
        size-1 clusters the caller's corpus join supplies by the usual
        coalesce convention."""
        return (
            self.clusters()
            .groupBy("component")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
        )

    def size_spectrum(self) -> DataFrame:
        """``(n_nodes, n_clusters)`` ordered by size — the dedup-payoff
        histogram ("how many 2-dup, 10-dup, 1000-dup clusters"), the
        number a curation pass reads to estimate corpus shrinkage
        before choosing a survivor policy. Bounded by distinct cluster
        sizes; answered from store state alone."""
        return (
            self.cluster_sizes()
            .groupBy("n_nodes")
            .agg(F.count(F.lit(1)).alias("n_clusters"))
            .orderBy("n_nodes")
        )

    def remap_log_size(self) -> int:
        """Merge events currently in the log — the checkpoint() trigger
        metric (driver memory during reads is O(this))."""
        return len(self._remap_pairs())

    # -- maintenance --------------------------------------------------------
    def checkpoint(
        self, target_partitions: int = 8, keep_last: int = 2
    ) -> bool:
        """Fold the remap log into the stored assignments: rewrite the
        consolidatable node directories as one compact directory with
        every root resolved (batch_id preserved as a data column, so
        the replay guard keeps working by value), then shrink the remap
        log to the entries the surviving directories can still need.
        Both rewrites use batch_layout.write_compact's crash-safety
        protocol (marker + atomic rename), and a batch landing
        mid-checkpoint is neither absorbed nor deleted.

        ``keep_last`` protects the newest N batch directories from
        consolidation — the same replay guard as ``compact_root``: a
        replayed batch whose rows were ALREADY folded into a compact
        directory would land its rows a second time (exclude-by-value
        only shields the batch's own processing, not later reads).
        Keeping the replayable dirs out keeps every node row landed
        exactly once. A kept directory from batch N can only be stale
        through merges recorded AFTER N (its own batch wrote
        fully-resolved roots), so the log keeps exactly the rows with
        ``batch_id >= min(kept ids)`` and drops the rest — folded rows
        carry current roots, which are never remap sources, so the
        retained entries are no-ops for them. Returns True if a
        rewrite ran."""
        self._check_meta(create=True)
        for root in self._store_roots():
            cleanup_superseded(root)
        nb, nc = live_dirs(self._nodes_dir)
        nb = sorted(
            nb, key=lambda d: int(os.path.basename(d).split("=", 1)[1])
        )
        kept = nb[len(nb) - keep_last:] if keep_last else []
        fold_batches = nb[: len(nb) - len(kept)]
        fold = fold_batches + nc
        pairs = self._remap_pairs()
        if len(fold) <= 1 and not pairs:
            return False
        parts = []
        if fold_batches:
            parts.append(
                self.spark.read.option("basePath", self._nodes_dir)
                .parquet(*fold_batches)
            )
        if nc:
            parts.append(self.spark.read.parquet(*nc))
        if not parts:
            return False
        nodes = parts[0]
        for part in parts[1:]:
            nodes = nodes.unionByName(part)
        # no materialization needed: write_compact fully writes the
        # frame to its temp dir BEFORE deleting the source dirs the
        # plan reads from
        rm = self._resolved_frame(pairs)
        resolved = nodes.join(
            F.broadcast(rm), nodes["root"] == rm["old_root"], "left"
        ).select(
            "batch_id", "node", F.coalesce("new_root", "root").alias("root")
        )
        if self.n_buckets is not None:
            resolved = resolved.withColumn("b", self._bucket(F.col("node")))
        write_compact(
            resolved, self._nodes_dir, fold,
            target_partitions=target_partitions,
            cluster_by=["b"] if self.n_buckets is not None else None,
        )
        rb, rc = live_dirs(self._remaps_dir)
        if rb or rc:
            thresh = min(
                (int(os.path.basename(d).split("=", 1)[1]) for d in kept),
                default=None,
            )
            survivors = read_root(self.spark, self._remaps_dir, REMAP_FIELDS)
            survivors = (
                survivors.filter(F.col("batch_id") >= F.lit(thresh))
                if thresh is not None
                else survivors.limit(0)
            )
            write_compact(
                survivors, self._remaps_dir, rb + rc, target_partitions=1
            )
        return True
