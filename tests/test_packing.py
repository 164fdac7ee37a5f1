"""Boundary-respecting FFD sequence packing (operators/packing.py):
partition invariants, the FFD quality bound, exact equality with a
pure-Python reference, determinism across input layouts, oversize
routing, and the plan shape (one explicit shard shuffle, one Arrow
stage). Pytest-pinned only this round — round 9 holds the oracle
registration freeze."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.packing import (
    ffd_pack,
    pack_stats,
)

BUDGET = 100


def _df(spark, sizes, ids=None):
    ids = ids if ids is not None else list(range(len(sizes)))
    return spark.createDataFrame(
        list(zip(ids, sizes)), "doc_id long, n_tokens long"
    )


def _assignment(packed):
    return {r["id"]: (r["pack_id"], r["oversize"]) for r in packed.collect()}


def test_every_doc_packed_exactly_once_and_capacity_holds(spark):
    sizes = [60, 55, 50, 45, 40, 35, 30, 25, 20, 15, 10, 5, 99, 1]
    packed = ffd_pack(_df(spark, sizes), "doc_id", "n_tokens", BUDGET)
    rows = packed.collect()
    assert sorted(r["id"] for r in rows) == list(range(len(sizes)))
    fills = {}
    for r in rows:
        assert not r["oversize"]
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["size"]
    assert all(f <= BUDGET for f in fills.values())


def test_ffd_quality_bound_per_shard(spark):
    """Per shard: packs <= 11/9 * OPT + 1 with OPT >= ceil(total/budget)
    (Johnson 1973; Dósa's tight additive constant is 6/9, we allow 1)."""
    sizes = [7 * (i % 13) + 3 for i in range(400)]
    packed = ffd_pack(
        _df(spark, sizes), "doc_id", "n_tokens", BUDGET, n_shards=4
    )
    per_shard = (
        packed.groupBy("shard")
        .agg(
            F.countDistinct("pack_id").alias("packs"),
            F.sum("size").alias("total"),
        )
        .collect()
    )
    for r in per_shard:
        opt_lb = math.ceil(r["total"] / BUDGET)
        assert r["packs"] <= math.ceil(11 / 9 * opt_lb) + 1, r


def test_matches_pure_python_ffd_reference(spark):
    """Exact assignment equality vs an independent reference FFD on a
    single shard (n_shards=1 makes the whole input one shard)."""
    sizes = [37, 80, 12, 99, 54, 12, 37, 61, 5, 44, 100, 1]
    packed = ffd_pack(
        _df(spark, sizes), "doc_id", "n_tokens", BUDGET, n_shards=1
    )
    got = {r["id"]: r["pack_id"] & 0xFFFFFFFF for r in packed.collect()}

    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    remaining: list[int] = []
    want = {}
    for i in order:
        sz = sizes[i]
        if sz > BUDGET:
            remaining.append(-1)
            want[i] = len(remaining) - 1
            continue
        for b, cap in enumerate(remaining):
            if cap >= sz:
                remaining[b] = cap - sz
                want[i] = b
                break
        else:
            remaining.append(BUDGET - sz)
            want[i] = len(remaining) - 1
    assert got == want


def test_deterministic_across_input_layouts(spark):
    """Shard = hash(id) and in-shard order = (size desc, id), so the
    assignment must not depend on how the input was partitioned."""
    sizes = [9 * (i % 23) + 1 for i in range(300)]
    a = _assignment(
        ffd_pack(_df(spark, sizes), "doc_id", "n_tokens", BUDGET, n_shards=8)
    )
    shuffled = _df(spark, sizes).repartition(13, "n_tokens")
    b = _assignment(
        ffd_pack(shuffled, "doc_id", "n_tokens", BUDGET, n_shards=8)
    )
    assert a == b


def test_oversize_docs_are_flagged_singleton_packs(spark):
    sizes = [150, 250, 40, 40]
    packed = ffd_pack(_df(spark, sizes), "doc_id", "n_tokens", BUDGET,
                      n_shards=1)
    rows = {r["id"]: r for r in packed.collect()}
    assert rows[0]["oversize"] and rows[1]["oversize"]
    assert not rows[2]["oversize"] and not rows[3]["oversize"]
    # oversize packs hold exactly one doc; their bins are never reused
    by_pack: dict = {}
    for r in rows.values():
        by_pack.setdefault(r["pack_id"], []).append(r["id"])
    assert sorted(len(v) for v in by_pack.values()) == [1, 1, 2]

    stats = pack_stats(packed, BUDGET).collect()[0]
    assert stats["n_packs"] == 3
    assert stats["n_oversize_packs"] == 2
    assert stats["n_docs"] == 4
    assert stats["packed_tokens"] == 80
    assert stats["wasted_tokens"] == 20
    assert stats["fill_factor"] == pytest.approx(0.8)


def test_all_oversize_fill_factor_is_zero_not_null(spark):
    packed = ffd_pack(_df(spark, [150, 250]), "doc_id", "n_tokens", BUDGET,
                      n_shards=1)
    stats = pack_stats(packed, BUDGET).collect()[0]
    assert stats["n_oversize_packs"] == 2
    assert stats["fill_factor"] == 0.0  # defined, not NULL


def test_invalid_inputs_are_loud(spark):
    with pytest.raises(ValueError, match="budget"):
        ffd_pack(_df(spark, [1]), "doc_id", "n_tokens", 0)
    with pytest.raises(ValueError, match="n_shards"):
        ffd_pack(_df(spark, [1]), "doc_id", "n_tokens", 10, n_shards=0)
    with pytest.raises(Exception, match="non-negative"):
        ffd_pack(_df(spark, [-5]), "doc_id", "n_tokens", 10).collect()
    with pytest.raises(ValueError, match="max_shard_rows"):
        ffd_pack(_df(spark, [1]), "doc_id", "n_tokens", 10, max_shard_rows=0)


def test_undersharded_run_fails_with_resize_hint(spark):
    """One shard = one in-memory Arrow batch, so an under-sharded run
    must fail actionably (r9 verdict item 6) — with the resize
    arithmetic in the message — instead of OOMing an executor
    mid-applyInPandas. Tiny threshold stands in for a 100x corpus."""
    df = _df(spark, [10] * 6)
    with pytest.raises(Exception, match="raise.*n_shards"):
        ffd_pack(
            df, "doc_id", "n_tokens", BUDGET, n_shards=1, max_shard_rows=2
        ).collect()
    # at or under the ceiling the same corpus packs fine
    ok = ffd_pack(
        df, "doc_id", "n_tokens", BUDGET, n_shards=1, max_shard_rows=6
    )
    assert ok.count() == 6


def test_plan_one_shuffle_one_arrow_stage(spark):
    packed = ffd_pack(
        _df(spark, [10] * 50), "doc_id", "n_tokens", BUDGET, n_shards=4
    )
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan  # the explicit shard shuffle
    assert "FlatMapGroupsInPandas" in plan, plan


def _naive_first_fit(sizes, budget):
    """The O(n^2) reference loop the segment tree must reproduce
    bit-identically (leftmost open bin with cap >= sz)."""
    remaining: list[int] = []
    packs, oversize = [], []
    for sz in sizes:
        if sz > budget:
            remaining.append(-1)
            packs.append(len(remaining) - 1)
            oversize.append(True)
            continue
        for b, cap in enumerate(remaining):
            if cap >= sz:
                remaining[b] = cap - sz
                packs.append(b)
                break
        else:
            remaining.append(budget - sz)
            packs.append(len(remaining) - 1)
        oversize.append(False)
    return packs, oversize


@settings(max_examples=300, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=200), min_size=0,
                   max_size=200),
    budget=st.integers(min_value=1, max_value=150),
)
def test_segment_tree_equals_naive_first_fit(sizes, budget):
    """The O(n log n) segment-tree first-fit makes the SAME leftmost
    choice as the naive scan on arbitrary inputs (no Spark — pure
    assignment arithmetic)."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.packing import (
        _ffd_assign,
    )

    assert _ffd_assign(sizes, budget) == _naive_first_fit(sizes, budget)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=150), min_size=1,
                   max_size=60),
    budget=st.integers(min_value=1, max_value=120),
    n_shards=st.integers(min_value=1, max_value=5),
)
def test_packing_invariants_on_random_inputs(spark, sizes, budget, n_shards):
    packed = ffd_pack(
        _df(spark, sizes), "doc_id", "n_tokens", budget, n_shards=n_shards
    ).collect()
    assert sorted(r["id"] for r in packed) == list(range(len(sizes)))
    fills: dict = {}
    for r in packed:
        assert r["oversize"] == (r["size"] > budget)
        fills.setdefault(r["pack_id"], []).append(r["size"])
    for pid, members in fills.items():
        if sum(members) > budget:
            assert len(members) == 1  # only an oversize singleton may exceed
