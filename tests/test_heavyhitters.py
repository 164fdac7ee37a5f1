"""Mergeable heavy-hitter summaries (operators/heavyhitters.py +
streaming/heavyhitter_maintenance.py): bounds always contain the true
counts, the no-false-negative guarantee above the global truncation
threshold, exactness when k covers the vocabulary, determinism of the
summary under row order and tie-breaks, and the maintained store's
replay/compaction behavior."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from example_cdk_dynamodb_stream_to_redshift_spark.operators.heavyhitters import (
    batch_summary,
    exact_recount,
    heavy_hitters,
    merged_bounds,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.heavyhitter_maintenance import (
    HeavyHitterMaintenance,
)

SCHEMA = "key string"


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], SCHEMA)


def _summarize_slices(spark, slices, k):
    """Python-side merge input: per-slice summaries unioned with a
    batch_id column, mirroring what the store's reader yields."""
    from pyspark.sql import functions as F

    out = None
    for i, keys in enumerate(slices):
        s = batch_summary(_df(spark, keys), "key", k).withColumn(
            "batch_id", F.lit(i)
        )
        out = s if out is None else out.unionByName(s)
    return out


def test_exact_when_k_covers_vocabulary(spark):
    slices = [["a", "b", "a"], ["b", "c"], ["a"]]
    truth = Counter(k for s in slices for k in s)
    bounds = {
        r["key"]: (r["lower"], r["upper"])
        for r in merged_bounds(_summarize_slices(spark, slices, 10)).collect()
    }
    assert bounds == {k: (v, v) for k, v in truth.items()}


def test_threshold_is_exact_max_dropped_and_zero_without_truncation(spark):
    keys = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    s = batch_summary(_df(spark, keys), "key", 2).collect()
    assert sorted((r["key"], r["cnt"]) for r in s) == [("a", 5), ("b", 3)]
    assert all(r["thresh"] == 2 for r in s)  # c(2) is the max dropped
    s2 = batch_summary(_df(spark, keys), "key", 10).collect()
    assert all(r["thresh"] == 0 for r in s2)


def test_tie_at_the_k_boundary_breaks_by_key(spark):
    keys = ["x"] * 2 + ["a"] * 2 + ["m"] * 2 + ["z"]
    s = sorted(r["key"] for r in batch_summary(_df(spark, keys), "key", 2).collect())
    assert s == ["a", "m"]  # ties at cnt=2: key-ascending wins


def test_summary_is_order_invariant(spark):
    keys = ["a", "b", "a", "c", "b", "a", "d"]
    s1 = sorted(
        tuple(r) for r in batch_summary(_df(spark, keys), "key", 2).collect()
    )
    s2 = sorted(
        tuple(r)
        for r in batch_summary(_df(spark, list(reversed(keys))), "key", 2).collect()
    )
    assert s1 == s2


def test_null_keys_are_excluded(spark):
    s = batch_summary(_df(spark, ["a", None, "a", None]), "key", 5).collect()
    assert [(r["key"], r["cnt"]) for r in s] == [("a", 2)]


def test_numeric_keys_stored_as_strings_and_recount_stays_exact(spark):
    """Operator-level numeric keys (no maintenance wrapper): the summary
    must cast the key to string itself, so exact_recount's semi-join is
    string-vs-string on every call path. With a numeric summary key the
    join coerces via DOUBLE, and ids beyond ~2^53 collide — 2^60 and
    2^60+1 share a double, so the non-candidate id would spuriously
    survive the recount (a false positive the docstring forbids)."""
    from pyspark.sql import functions as F

    hot, shadow = 2**60 + 1, 2**60  # double(hot) == double(shadow)
    corpus = spark.createDataFrame(
        [(hot,)] * 5 + [(shadow,)], "key long"
    )
    summ = batch_summary(corpus, "key", 1).withColumn("batch_id", F.lit(0))
    assert dict(summ.dtypes)["key"] == "string"
    hits = exact_recount(corpus, summ, "key", 1).collect()
    assert [(r["key"], r["cnt"]) for r in hits] == [(str(hot), 5)]


@given(
    data=st.lists(
        st.lists(st.integers(min_value=0, max_value=8), max_size=25),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=6),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bounds_always_contain_truth(spark, data, k):
    slices = [[f"k{v}" for v in s] for s in data]
    truth = Counter(x for s in slices for x in s)
    summ = _summarize_slices(spark, slices, k)
    rows = merged_bounds(summ).collect()
    bounds = {r["key"]: (r["lower"], r["upper"]) for r in rows}
    total_thresh = sum(
        max(
            (r["thresh"] for r in summ.filter(f"batch_id = {i}").collect()),
            default=0,
        )
        for i in range(len(slices))
    )
    for key, true_cnt in truth.items():
        lo, hi = bounds.get(key, (0, total_thresh))
        assert lo <= true_cnt <= hi, (key, true_cnt, lo, hi)
    # no-false-negative regime: every key above the global truncation
    # bound is present in the merged view
    for key, true_cnt in truth.items():
        if true_cnt > total_thresh:
            assert key in bounds, (key, true_cnt, total_thresh)


def test_heavy_hitters_completeness_and_ranking(spark):
    slices = [
        ["hot"] * 30 + ["warm"] * 6 + ["x", "y", "z"],
        ["hot"] * 25 + ["warm"] * 5 + ["p", "q"],
    ]
    summ = _summarize_slices(spark, slices, 2)
    hits = heavy_hitters(summ, 10).collect()
    names = [r["key"] for r in hits]
    assert names[0] == "hot" and "warm" in names
    hot = next(r for r in hits if r["key"] == "hot")
    assert hot["lower"] == 55 == hot["upper"]  # in top-k of every slice


def test_store_maintains_replays_and_compacts(spark, tmp_path):
    store = HeavyHitterMaintenance(spark, "key", 2, str(tmp_path / "hh"))
    slices = [
        ["a"] * 9 + ["b"] * 4 + ["c"],
        [],  # idle batch
        ["b"] * 6 + ["d"] * 5 + ["e"] * 2,
    ]
    for i, s in enumerate(slices):
        store.process_batch(_df(spark, s), i)
    truth = Counter(x for s in slices for x in s)
    before = {r["key"]: (r["lower"], r["upper"]) for r in store.bounds().collect()}
    for key, cnt in truth.items():
        lo, hi = before.get(key, (0, 10**9))
        assert lo <= cnt <= hi
    # a: 9 exact in batch 0, absent from batch 2 whose thresh is 2
    # (batch 0's own thresh is 1 — c dropped; the idle batch adds 0)
    assert before["a"] == (9, 11)
    # replay idempotence
    store.process_batch(_df(spark, slices[0]), 0)
    assert {
        r["key"]: (r["lower"], r["upper"]) for r in store.bounds().collect()
    } == before
    # compaction preserves the merged view
    store.compact(keep_last=1)
    assert {
        r["key"]: (r["lower"], r["upper"]) for r in store.bounds().collect()
    } == before
    assert store.hitters(5).filter("key = 'b'").count() == 1


def test_k_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="k must be"):
        batch_summary(_df(spark, ["a"]), "key", 0)
    with pytest.raises(ValueError, match="k must be"):
        HeavyHitterMaintenance(spark, "key", 0, str(tmp_path / "x"))


def test_topk_extraction_is_bounded_not_a_global_sort(spark):
    """Pin the whole summary plan shape, not just the top-k node: the
    heap-based TakeOrderedAndProject is present AND nothing anywhere in
    the plan sorts or range-partitions — the bounded-heap property this
    operator's scale story rests on."""
    plan = (
        batch_summary(_df(spark, ["a", "b", "a"]), "key", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Sort") == 0  # no Sort node anywhere
    assert "rangepartitioning" not in plan  # the global-sort signature
    assert "SortMergeJoin" not in plan  # residual join stays broadcast


def test_store_key_schema_is_stable_across_store_state(spark, tmp_path):
    """An int-keyed store returns string-typed keys BOTH before the
    first batch lands (declared empty schema) and after (cast at
    write): the schema must not flip with store state."""
    store = HeavyHitterMaintenance(spark, "uid", 3, str(tmp_path / "ik"))
    empty_type = dict(store.bounds().dtypes)["key"]
    store.process_batch(
        spark.createDataFrame([(7,), (7,), (9,)], "uid long"), 0
    )
    full_type = dict(store.bounds().dtypes)["key"]
    assert empty_type == full_type == "string"
    assert {r["key"]: r["lower"] for r in store.bounds().collect()} == {
        "7": 2,
        "9": 1,
    }


def test_exact_recount_two_phase(spark, tmp_path):
    """Candidates from the store + one exact filtered scan: output has
    no false positives, exact counts, and misses nothing above the
    threshold bound."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.heavyhitters import (
        exact_recount,
    )

    slices = [
        ["hot"] * 30 + ["warm"] * 6 + ["x", "y", "z"],
        ["hot"] * 25 + ["warm"] * 5 + ["x"] * 4 + ["p", "q"],
    ]
    corpus = _df(spark, [k for s in slices for k in s])
    summ = _summarize_slices(spark, slices, 2)
    got = [(r["key"], r["cnt"]) for r in exact_recount(corpus, summ, "key", 5).collect()]
    # x (true count 5) sits EXACTLY at the summed thresholds (1 + 4):
    # the completeness guarantee is strict (> total_thresh), so x can
    # legitimately hide inside both truncations — and does. hot/warm
    # are recovered with exact counts and no false positives.
    assert got == [("hot", 55), ("warm", 11)]
    # a larger k stores x in both slices (slice 0's cnt=1 tie breaks to
    # x by key; slice 1 keeps x4 outright) and recount recovers it
    summ3 = _summarize_slices(spark, slices, 3)
    got3 = [
        (r["key"], r["cnt"])
        for r in exact_recount(corpus, summ3, "key", 5).collect()
    ]
    assert got3 == [("hot", 55), ("warm", 11), ("x", 5)]
    # plan: candidate set rides a broadcast semi-join, corpus unshuffled
    # before the candidate-key aggregation
    plan = (
        exact_recount(corpus, summ, "key", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_store_recount_matches_operator(spark, tmp_path):
    store = HeavyHitterMaintenance(spark, "key", 2, str(tmp_path / "rc"))
    slices = [["a"] * 9 + ["b"] * 4 + ["c"], ["b"] * 6 + ["d"] * 5]
    for i, s in enumerate(slices):
        store.process_batch(_df(spark, s), i)
    corpus = _df(spark, [k for s in slices for k in s])
    got = [(r["key"], r["cnt"]) for r in store.recount(corpus, 5).collect()]
    assert got == [("b", 10), ("a", 9), ("d", 5)]


@given(
    data=st.lists(
        st.lists(st.integers(min_value=0, max_value=6), max_size=20),
        min_size=1,
        max_size=3,
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_recount_equals_exact_groupby_above_the_bound(spark, data, k):
    """Above the summed truncation thresholds, the two-phase recount is
    EXACTLY the filtered exact GROUP BY it replaces — for any slicing
    and any k."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.heavyhitters import (
        exact_recount,
    )

    slices = [[f"k{v}" for v in s] for s in data]
    truth = Counter(x for s in slices for x in s)
    summ = _summarize_slices(spark, slices, k)
    total_thresh = sum(
        max(
            (r["thresh"] for r in summ.filter(f"batch_id = {i}").collect()),
            default=0,
        )
        for i in range(len(slices))
    )
    min_count = total_thresh + 1
    corpus = _df(spark, [x for s in slices for x in s])
    got = [
        (r["key"], r["cnt"])
        for r in exact_recount(corpus, summ, "key", min_count).collect()
    ]
    want = sorted(
        ((x, c) for x, c in truth.items() if c >= min_count),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == want
