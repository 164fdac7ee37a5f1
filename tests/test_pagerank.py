"""PageRank (operators/pagerank.py) vs a plain-numpy power iteration of
the identical formulation (uniform teleport, dangling mass redistributed
uniformly), plus structural invariants."""

from __future__ import annotations

import numpy as np
import pytest


def _ref_pagerank(edge_list, d=0.85, iters=30):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edge_list:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        share = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
        for u, v in edge_list:
            inflow[idx[v]] += share[idx[u]]
        dangling = r[deg == 0].sum()
        r = (1.0 - d) / n + d * (inflow + dangling / n)
    return {u: r[idx[u]] for u in nodes}


def _run(spark, edge_list, **kw):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.pagerank import (
        pagerank,
    )

    edges = spark.createDataFrame(edge_list, "src long, dst long").repartition(4)
    return {r["node"]: r["rank"] for r in pagerank(edges, **kw).collect()}


EDGES = [
    (1, 2), (2, 3), (3, 1),        # a cycle
    (4, 1), (4, 2), (4, 3),        # a hub feeding the cycle
    (5, 4),                        # a chain into the hub
    (3, 6),                        # 6 is DANGLING (no out-links)
    (2, 3),                        # parallel edge: contributes twice
]


def test_matches_numpy_power_iteration(spark):
    got = _run(spark, EDGES, iters=30, tol=None)
    want = _ref_pagerank(EDGES, iters=30)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-9), node


def test_ranks_sum_to_one_with_dangling_mass(spark):
    got = _run(spark, EDGES, iters=25, tol=None)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the dangling sink still holds rank, and the hub's feeder is weakest
    assert got[6] > 0
    assert min(got, key=got.get) == 5


def test_early_exit_converges_to_fixed_point(spark):
    fixed = _run(spark, EDGES, iters=60, tol=None)
    early = _run(spark, EDGES, iters=60, tol=1e-12)
    for node in fixed:
        assert early[node] == pytest.approx(fixed[node], abs=1e-8)


def test_modes_agree(spark, tmp_path):
    from .test_lineage_modes import reliable_mode

    base = _run(spark, EDGES, iters=8, tol=None)
    with reliable_mode(spark, tmp_path / "ckpt"):
        reliable = _run(spark, EDGES, iters=8, tol=None)
    assert base == reliable


def test_empty_graph(spark):
    got = _run(spark, [], iters=5)
    assert got == {}


def _ref_pagerank_quantized(edge_list, iters=5, scale=10**12, num=85, den=100):
    """Pure-Python integer twin (floor div everywhere), mirroring both the
    Spark operator and the unrolled DuckDB oracle."""
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    n = len(nodes)
    deg: dict[int, int] = {}
    for u, _ in edge_list:
        deg[u] = deg.get(u, 0) + 1
    teleport = ((den - num) * scale) // (den * n)
    r = {u: scale // n for u in nodes}
    for _ in range(iters):
        inflow = {u: 0 for u in nodes}
        for u, v in edge_list:
            inflow[v] += r[u] // deg[u]
        dangling = sum(r[u] for u in nodes if u not in deg)
        r = {
            u: teleport + (num * (inflow[u] + dangling // n)) // den
            for u in nodes
        }
    return r


def test_quantized_matches_integer_reference_exactly(spark):
    """pagerank_quantized is the exact-oracle twin: every step is int64,
    so the distributed result must equal the serial integer reference
    BIT-FOR-BIT (not approximately) regardless of partitioning."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.pagerank import (
        pagerank_quantized,
    )

    edges = spark.createDataFrame(EDGES, "src long, dst long").repartition(4)
    got = {
        r["node"]: r["rank_q"]
        for r in pagerank_quantized(edges, iters=5).collect()
    }
    assert got == _ref_pagerank_quantized(EDGES, iters=5)


def test_quantized_tracks_float_operator(spark):
    """In units of 1/scale the integer twin loses at most a few floor
    steps per iteration — it must sit within ~1e-9 of the float operator
    at the same iteration count, so the twin certifies the same math."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.pagerank import (
        pagerank_quantized,
    )

    scale = 10**12
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    q = {
        r["node"]: r["rank_q"] / scale
        for r in pagerank_quantized(edges, iters=8, scale=scale).collect()
    }
    f = _run(spark, EDGES, iters=8, tol=None)
    assert set(q) == set(f)
    for node in f:
        assert q[node] == pytest.approx(f[node], abs=1e-8), node
