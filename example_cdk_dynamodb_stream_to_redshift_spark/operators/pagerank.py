"""PageRank centrality over an edge list — link-graph quality weighting.

Web-scale corpus curation weights documents by host/page centrality
(RefinedWeb/CCNet-style pipelines use link-graph signals next to the
content-quality rules in functions/text.py); PageRank is the canonical
such signal (Page et al. 1999 — public method, Spark-first
implementation). The reference (sql/queries.sql) has no graph surface;
this extends the engine's training-data-pipeline family per SURVEY.md,
joining connected components (operators/components.py) in the iterative
family.

Plan shape per iteration (all JVM-side):
- contributions: ranks ⋈ edges on src (one hash shuffle on the uniform
  node key), grouped by dst with map-side partial sums;
- dangling mass (nodes with no out-links) and the teleport term are
   1-row aggregates broadcast back — no driver round trip;
- lineage truncated every round via operators/lineage.truncate_lineage,
  so the plan stays O(1) deep and the opt-in reliable-checkpoint mode
  (spark.graft.checkpoint.reliable) survives executor loss at cluster
  scale exactly like components/BPE/ranking.

State per iteration is ONE row per node (never per edge); the edge list
is re-joined each round from its (cached) source, so a 100 TB edge set
streams through the join without ever being collected or re-keyed.
Convergence: fixed ``iters`` rounds (power iteration's contraction rate
is damping^k, so ~20-40 rounds reach float precision at d=0.85) or
early-exit when the L1 rank delta drops below ``tol`` — one bounded
node-keyed agg job per round over the two MATERIALIZED rank tables.
(Not ``Observation``: lineage truncation materializes through an
RDD-level action that never fires the SQL metrics listener, so an
observed delta would block forever — the same hazard
merge.finalize_merge_stats bounds with a timeout.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lineage import truncate_lineage


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 20,
    tol: float | None = 1e-9,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Rank every node of the directed graph ``edges``; returns
    ``(node, rank)`` with ranks summing to 1 (uniform-teleport PageRank,
    dangling mass redistributed uniformly — the standard formulation).

    Self-loops count like any other edge; parallel edges contribute
    multiply (pre-``distinct`` the input for simple-graph semantics).
    Nodes appearing only as destinations still receive rank; ``tol``
    stops early once the L1 rank delta falls below it (None = always
    run ``iters`` rounds).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    e = truncate_lineage(e)  # evaluated once; every iteration re-joins it
    nodes = truncate_lineage(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = truncate_lineage(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        # per-source share = rank/deg; nodes absent from out_deg are
        # dangling — their whole rank teleports uniformly
        with_deg = ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
        )
        contrib = (
            with_deg.filter(F.col("deg").isNotNull())
            .select(
                F.col("src"), (F.col("rank") / F.col("deg")).alias("share")
            )
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        new_ranks = truncate_lineage(
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("m") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if tol is not None:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(
                    F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))).alias("d")
                )
                .first()["d"]
            )
            ranks = new_ranks
            if delta is not None and float(delta) < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("node", "rank")
