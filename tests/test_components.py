"""connected_components (large-star/small-star) vs a brute-force
union-find, over adversarial graph shapes the corpus fixture won't hit:
long chains (diameter >> log n), stars, merging components, self-loops,
duplicate + reversed edges."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.components import (
    connected_components,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}

def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_chain_star_and_merge(spark):
    edges = (
        # a 60-node chain: diameter far beyond the O(log n) round budget,
        # the shape that breaks naive label propagation under the same cap
        [(i, i + 1) for i in range(100, 160)]
        # a star rooted at a HIGH id (canonical must still be the min)
        + [(500, k) for k in range(400, 420)]
        # two clusters merged by one bridge edge
        + [(1, 2), (3, 4), (2, 3)]
        # self-loop-only node: maps to itself
        + [(7, 7)]
    )
    assert _run(spark, edges) == _uf_components(edges) | {7: 7}


def test_duplicate_and_reversed_edges(spark):
    edges = [(10, 11), (11, 10), (10, 11), (12, 11)]
    assert _run(spark, edges) == {10: 10, 11: 10, 12: 10}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 80
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 90))
        ]
        expected = _uf_components([(a, b) for a, b in edges if a != b])
        loops_only = {
            a for a, b in edges if a == b
        } - set(expected)
        expected |= {x: x for x in loops_only}
        assert _run(spark, edges) == expected, f"trial {trial}"


def test_chain_round_count_is_logarithmic(spark):
    # The worst case for diameter-bound algorithms: a pure chain. The
    # large-star/small-star contraction must converge in O(log n) rounds —
    # empirically pinned here at two chain lengths a 4x apart, with the
    # round counts reported by the operator itself. Label propagation
    # would need n-1 rounds (64 / 256) and fail the same budget.
    import math

    rounds = {}
    for n in (64, 256):
        edges = [(i, i + 1) for i in range(n - 1)]
        stats: dict = {}
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                spark.createDataFrame(edges, "src long, dst long"),
                stats=stats,
                driver_finish_edges=0,  # pin the DISTRIBUTED algebra
            ).collect()
        }
        assert got == {i: 0 for i in range(n)}  # one component rooted at min
        rounds[n] = stats["rounds"]
        assert stats["rounds"] <= 2 * math.log2(n) + 4, (
            f"chain of {n}: {stats['rounds']} rounds exceeds the log bound"
        )
    # 4x the nodes must NOT cost 4x the rounds (that would be linear)
    assert rounds[256] <= rounds[64] + 4


def test_hot_template_star_converges_fast(spark):
    # Dedup-graph skew: one template document near-dups 20k others — a
    # single node of degree 20k. The groupBy-min partial aggregation
    # (map-side combine) must absorb the hot key: few rounds, exact
    # min-id canonical, no fan-out explosion.
    n = 20_000
    hub = n + 500  # hub id ABOVE every leaf: canonical must still be min
    edges_df = (
        spark.range(n)
        .selectExpr(f"{hub}L as src", "id as dst")
        .union(spark.range(5).selectExpr("id + 30000 as src", "id + 30001 as dst"))
    )
    stats: dict = {}
    out = connected_components(edges_df, stats=stats)
    comp = out.groupBy("component").count().collect()
    by_comp = {r["component"]: r["count"] for r in comp}
    assert by_comp[0] == n + 1  # hub + all leaves, canonical = min leaf id 0
    assert by_comp[30000] == 6
    assert stats["rounds"] <= 6, f"star took {stats['rounds']} rounds"


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1, driver_finish_edges=0)


def test_cluster_query_canonical_invariants(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory_ml import (
        dedup_clusters,
    )

    from .conftest import SF_CORRECTNESS

    out = dedup_clusters(spark, SF_CORRECTNESS)
    # exactly one canonical per cluster, and it is the cluster min
    bad = (
        out.groupBy("cluster_id")
        .agg(
            F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
            F.min("doc_id").alias("mn"),
            F.first("cluster_id").alias("cid"),
        )
        .filter((F.col("n_canon") != 1) | (F.col("mn") != F.col("cid")))
        .count()
    )
    assert bad == 0
    # every clustered doc appears once
    assert out.select("doc_id").distinct().count() == out.count()


def test_driver_finish_equals_distributed(spark):
    """The size-adaptive cutover (collect + min-rooted union-find) must
    produce the identical (node, component) mapping as the distributed
    rounds, on a graph mixing chains, stars, self-loops and singleton
    endpoints."""
    edges = (
        [(i, i + 1) for i in range(30)]          # chain
        + [(100, x) for x in (103, 101, 107)]    # star
        + [(200, 200), (300, 300)]               # self-loop-only nodes
        + [(400, 399)]                           # reversed pair
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    stats_d: dict = {}
    dist = {
        r["node"]: r["component"]
        for r in connected_components(df, stats=stats_d, driver_finish_edges=0).collect()
    }
    stats_f: dict = {}
    fin = {
        r["node"]: r["component"]
        for r in connected_components(df, stats=stats_f).collect()
    }
    assert fin == dist
    assert stats_f["rounds"] == 0  # cutover fired immediately (tiny set)
    assert stats_f["driver_finish_edges"] == 34  # distinct non-self edges
    assert "driver_finish_edges" not in stats_d


def test_driver_finish_cutover_mid_iteration(spark):
    """A threshold between the initial and contracted edge-set sizes runs
    SOME distributed rounds, then finishes locally — same answer. A
    30-clique's 435 redundant edges contract toward its 29-edge star, so
    the count genuinely crosses a 100-edge bound mid-iteration."""
    n = 30
    df = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(i + 1, n)],
        "src long, dst long",
    )
    stats: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            df, stats=stats, driver_finish_edges=100
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] >= 1            # the set started above the bound
    assert stats["driver_finish_edges"] <= 100
