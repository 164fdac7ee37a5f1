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


def pagerank_quantized(
    edges: DataFrame,
    iters: int = 5,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in INTEGER arithmetic — the exact-config
    oracle twin of :func:`pagerank` (the pattern every ANN probing form
    here has: a float/approximate production operator plus an exactly
    reproducible configuration a SQL engine can re-derive bit-for-bit).

    Ranks are int64 in units of ``1/scale``; every step is integer:
    per-source share = ``rank_q div deg``, inflow = exact integer SUM,
    dangling mass divided by n with integer div, damping applied as
    ``(num * x) div den``. Integer sums are order-independent, so Spark's
    partial aggregation and a serial SQL engine produce IDENTICAL values
    — which is what a driver hash comparison needs; the float operator
    can never promise that across summation orders. Same per-iteration
    plan shape as :func:`pagerank` (one node-keyed shuffle, broadcast
    1-row dangling agg, truncated lineage), so the scale story is
    unchanged. Floor losses mean ranks sum to slightly under ``scale``;
    parity, not normalization, is the point.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    e = truncate_lineage(e)
    nodes = truncate_lineage(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_q", F.lit(0).cast("long"))
    out_deg = truncate_lineage(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    )
    # Python // == SQL `div`/`//` for non-negative ints: same teleport term
    teleport_q = ((damping_den - damping_num) * scale) // (damping_den * n)

    ranks = nodes.withColumn("rank_q", F.lit(scale // n).cast("long"))
    for _ in range(iters):
        with_deg = ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank_q"), F.lit(0)).cast("long").alias("m"))
        )
        contrib = (
            with_deg.filter(F.col("deg").isNotNull())
            .select(F.col("src"), F.expr("rank_q div deg").alias("share_q"))
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("share_q").alias("inflow_q"))
        )
        ranks = truncate_lineage(
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(teleport_q)
                    + F.expr(
                        f"({damping_num} * (coalesce(inflow_q, 0L) "
                        f"+ (m div {n}))) div {damping_den}"
                    )
                ).cast("long").alias("rank_q"),
            )
        )
    return ranks.select("node", "rank_q")


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
