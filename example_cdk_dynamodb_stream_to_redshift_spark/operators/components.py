"""Connected components over an edge list — the missing last step of
corpus dedup: near-dup PAIRS (minhash/simhash/embedding) only say "a~b";
to actually drop duplicates you need the transitive closure (a~b, b~c =>
{a,b,c} is one cluster) and one canonical survivor per cluster.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14). Each round is
two groupBy-min + join passes over the edge list, and the edge set
contracts toward star graphs rooted at each component's minimum id in
O(log n) rounds — this is the published shuffle-bounded CC algorithm for
exactly this shape of cluster (dedup graphs: many tiny components, a few
big ones), unlike label propagation whose round count is the graph
DIAMETER (a 10k-long chain of near-dup shards = 10k rounds).

Scale notes (100 TB posture):
- every round shuffles by node id only — uniform key, no skew amplifier;
  a high-degree node (common template dup'd 1M times) is handled by the
  groupBy-min partial aggregation (map-side combine), never by fan-out.
- lineage is truncated every round via operators/lineage.py
  (localCheckpoint by default, reliable checkpoint when the session sets
  spark.graft.checkpoint.reliable=true) —
  without it the plan doubles per iteration and the DAG scheduler, not
  the data, becomes the bottleneck by round ~15. On a real cluster swap
  in ``df.checkpoint()`` against reliable storage for executor-loss
  recovery; local[32] has no executor loss, so the cheap form is used.
- convergence is detected with a distinct-subtract count per round
  (edges are already distinct, so subtract is one extra shuffle on data
  that has ALREADY contracted); rounds are capped by ``max_iter`` with a
  loud failure rather than a silent partial answer.

Reference scope: the reference app (damc-dev/example-cdk-dynamodb-stream-
to-redshift) has no dedup surface; this extends the engine for
training-data pipelines per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import truncate_lineage


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    stats: dict | None = None,
    driver_finish_edges: int = 1 << 18,
) -> DataFrame:
    """Resolve the edge list to ``(node, component)`` where ``component``
    is the minimum node id reachable from ``node`` (the canonical-doc
    convention: min id survives). Nodes appearing only as isolated
    endpoints of self-loops still map to themselves; nodes absent from
    the edge list are absent from the output (join the corpus back with
    a coalesce to keep singletons — see plans.inventory_ml.dedup_clusters).

    ``driver_finish_edges``: the size-adaptive cutover. The star rounds
    collapse redundant edges toward a star forest (one edge per non-root
    node), so the working set shrinks wherever components carry
    redundancy; whenever the current set fits under this bound
    (explicit O(E) driver memory — the same artifact-size discipline as
    the k-means centroid collects), the transitive closure finishes with
    one collect + min-rooted union-find instead of paying ~7 Spark jobs
    per remaining round for a set that no longer needs a cluster. Dedup
    graphs usually START under the bound (near-dup pairs are a vanishing
    fraction of the corpus), so the common case is zero distributed
    rounds; a 100 TB worst case runs distributed rounds only while the
    volume genuinely demands them. Pass 0 to force the fully-distributed
    path (the O(log n) round-count tests do).

    ``stats`` (optional dict) receives ``rounds`` — distributed
    large-star/small-star rounds executed — and ``driver_finish_edges``
    (edge count collected by the finish, absent when it never ran).
    tests/test_components.py pins the O(log n) bound empirically on
    chain graphs (the diameter-bound worst case for label propagation).
    """
    # Checkpoint the distinct edge set ONCE, self-loops still in, and hang
    # EVERYTHING downstream off it — the working set AND selfmap. The edge
    # source is typically the most expensive subtree in the whole job (a
    # near-dup candidate join over the corpus); deriving selfmap from the
    # raw `edges` would re-execute that subtree a second time when the
    # caller materializes the result (the root-mapping join reads selfmap),
    # doubling the dominant cost at any scale.
    e0 = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .distinct()
        .transform(truncate_lineage)
    )
    selfmap = (
        e0.select(F.col("u").alias("node"))
        .union(e0.select(F.col("v").alias("node")))
        .distinct()
    )
    e = e0.filter(F.col("u") != F.col("v"))
    if e.isEmpty():
        if stats is not None:
            stats["rounds"] = 0
        return selfmap.select("node", F.col("node").alias("component"))

    n_e = e.count()
    for _round in range(max_iter):
        if n_e <= driver_finish_edges:
            if stats is not None:
                stats["rounds"] = _round
            return _driver_finish(e, selfmap, n_e, stats)
        # -- large-star: every neighbor v > u re-points at m = min(N(u) ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        # no intermediate distinct: min-aggregations and equi-joins are
        # duplicate-insensitive, and e_next's single final distinct is the
        # only set-semantics point the algebra needs. Each dropped
        # distinct is one less shuffle of the edge volume per round —
        # invisible at bench SF (per-job overhead dominates there) but
        # volume-proportional at scale; dedup-graph duplicates
        # (multi-path neighbors) only add a small constant factor to the
        # intermediate volume in exchange
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # -- small-star: orient u > v; all small neighbors AND u re-point at
        #    m = min of the small neighborhood (m < u always, so no least())
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mn = oriented.groupBy("u").agg(F.min("v").alias("m"))
        e_next = (
            oriented.join(mn, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mn.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .transform(truncate_lineage)
        )
        # converged when the star edges stopped moving. Both sides are
        # DISTINCT sets, so |A| == |B| plus A∖B == ∅ proves A == B — one
        # subtract join per round instead of two (counts over the
        # checkpointed sets are cheap single-stage jobs)
        n_next = e_next.count()
        if n_next == n_e and e_next.exceptAll(e).isEmpty():
            e = e_next
            if stats is not None:
                stats["rounds"] = _round + 1
            break
        e, n_e = e_next, n_next
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # converged edge set is a star forest: (child, root) for every
    # non-root; roots map to themselves, as do self-loop-only nodes.
    child = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = selfmap.join(
        child.select(F.col("node")), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return child.union(roots)


def incremental_step(
    edges: DataFrame,
    mapping: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One incremental connected-components step: fold a batch of new
    near-dup ``edges`` into an existing ``(node, component)`` assignment
    WITHOUT recomputing the closure over everything seen — the batch
    analogue of re-running :func:`connected_components` from scratch,
    with per-batch cost bounded by the BATCH, not the corpus.

    ``mapping`` is the current resolved assignment (``node``,
    ``component`` — component = min reachable id, the same canonical
    convention as ``connected_components``); it is only ever PROBED with
    a broadcast semi-join on the batch's endpoints, never scanned into
    the driver or shuffled. Returns one row per batch endpoint::

        (node, prev_root, root)

    where ``prev_root`` is NULL for nodes not in ``mapping`` (first
    sighting) and ``root`` is the node's component AFTER the batch's
    edges are applied. The caller derives its two increments from this
    single frame: new assignments (``prev_root IS NULL``) and root
    remaps (``prev_root != root`` — every superseded root appears as
    some endpoint's ``prev_root``, because resolution maps endpoints to
    their CURRENT roots before contraction). Roots only ever decrease
    (the new root is the min over a merged set containing the old one),
    so recorded remaps form acyclic, driver-resolvable chains — see
    :func:`resolve_remaps`.

    Why this is the 100 TB shape: the contracted graph (batch edges
    re-written onto current roots) has at most ``2|E_batch|`` nodes, so
    the closure runs on a batch-sized graph — usually finishing in the
    size-adaptive driver path of ``connected_components`` — while the
    corpus-sized state is touched exactly once, by one broadcast
    semi-join probe (bucket the store on ``node`` on a real cluster and
    the probe is also shuffle-free). Landed assignments are never
    rewritten; merges are carried as a remap log applied at read time
    (streaming/cluster_maintenance.ClusterMaintenance).
    """
    dtypes = dict(edges.dtypes)
    for c in (src, dst):
        if dtypes.get(c) not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"edge column {c!r} must be an integral node id (got "
                f"{dtypes.get(c)}); a lossy cast would silently DROP "
                "rows as NULL — hash string ids to int64 upstream "
                "(xxhash64) instead."
            )
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .transform(truncate_lineage)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
    )
    # probe the corpus-sized mapping ONCE: broadcast the batch's node set
    # into a semi-join (one mapping scan, zero mapping shuffle), which
    # leaves a batch-bounded lookup that is itself broadcastable into the
    # left join. Materialize: `cur` feeds three joins below and must not
    # re-run the probe (or the mapping subtree) per consumer.
    lookup = mapping.join(F.broadcast(nodes), "node", "left_semi")
    cur = (
        nodes.join(F.broadcast(lookup), "node", "left")
        .select(
            "node",
            F.col("component").alias("prev_root"),
            F.coalesce(F.col("component"), F.col("node")).alias("cur"),
        )
        .transform(truncate_lineage)
    )
    cu = cur.select(F.col("node").alias("u"), F.col("cur").alias("cu"))
    cv = cur.select(F.col("node").alias("v"), F.col("cur").alias("cv"))
    contracted = e.join(cu, "u").join(cv, "v").select(
        F.col("cu").alias("src"), F.col("cv").alias("dst")
    )
    comp = connected_components(contracted, "src", "dst")
    return cur.join(
        F.broadcast(comp), cur["cur"] == comp["node"], "left"
    ).select(
        cur["node"],
        "prev_root",
        F.coalesce(F.col("component"), F.col("cur")).alias("root"),
    )


def resolve_remaps(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Collapse a root-remap log to its transitive closure: each
    ``(old_root, new_root)`` entry records one cluster merge (new < old
    always — the min-id convention), so chains like ``5→4, 4→3`` resolve
    to ``{5: 3, 4: 3}``. Strictly-decreasing targets make the log
    acyclic, and each old root appears at most once as a source (once
    superseded, a root is never current again, so no later merge records
    it), so plain memoized pointer-chasing is exact. Driver-side by
    design: the log is one row per merge EVENT, kilobytes against any
    corpus, and the resolved dict is broadcast back into the read path.
    """
    nxt = {}
    for old, new in pairs:
        if old == new:
            continue
        if old < new:
            raise ValueError(
                f"remap {old}->{new} increases the root; the min-id "
                "convention requires strictly decreasing targets"
            )
        if old in nxt and nxt[old] != new:
            # A root is superseded at most once, so a second entry with a
            # DIFFERENT target means the log is corrupted (or two merge
            # histories were mixed); last-wins here would resolve
            # nondeterministically with parquet read order.
            raise ValueError(
                f"conflicting remap log: {old}->{nxt[old]} and {old}->{new}"
            )
        nxt[old] = new
    resolved: dict[int, int] = {}

    def final(r: int) -> int:
        seen = []
        while r in nxt and r not in resolved:
            seen.append(r)
            r = nxt[r]
        r = resolved.get(r, r)
        for s in seen:
            resolved[s] = r
        return r

    for old in nxt:
        final(old)
    return resolved


def _driver_finish(e: DataFrame, selfmap: DataFrame, n_e: int, stats: dict | None) -> DataFrame:
    """Finish the closure locally: one bounded collect + min-rooted
    union-find (union always parents the larger root under the smaller,
    so find() yields the component's MINIMUM id — the same canonical
    convention as the distributed rounds). Output contract matches the
    distributed exit: every edge endpoint mapped, self-loop-only nodes
    map to themselves."""
    if stats is not None:
        stats["driver_finish_edges"] = n_e
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in e.collect():
        ra, rb = find(row["u"]), find(row["v"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    spark = e.sparkSession
    mapping = spark.createDataFrame(
        [(n, find(n)) for n in parent] or [(None, None)],
        "node long, component long",
    ).filter(F.col("node").isNotNull())
    roots = selfmap.join(mapping.select("node"), "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return mapping.union(roots)
