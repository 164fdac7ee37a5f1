"""Efraimidis-Spirakis weighted sampling (operators/weighted_sample.py
+ streaming/sample_maintenance.WeightedSample): the sample IS the k
largest ln(u)/w priorities (pure-Python reference), duplicate collapse
and weight contracts, seed behavior, exact merge algebra on random
slicings, bounded-heap plan shape, and the maintained store's equality
to the direct sample."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from example_cdk_dynamodb_stream_to_redshift_spark.operators.weighted_sample import (
    merge_weighted_samples,
    weighted_sample_keys,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.sample_maintenance import (
    WeightedSample,
)


def _pr(key: str, w: float, seed: int = 0) -> float:
    u64 = int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:16], 16)
    u = (float(u64) + 0.5) / float(2**64)
    return math.log(u) / w


def _ref(rows, k, seed=0):
    """The definition, independently restated: collapse duplicate keys
    to max weight, drop NULL/zero/NaN weights, keep the k largest
    priorities with (pr desc, key asc) ties."""
    pop: dict[str, float] = {}
    for key, w in rows:
        if key is None or w is None or w != w or w == 0.0:
            continue
        key = str(key)
        pop[key] = max(pop.get(key, float("-inf")), float(w))
    ranked = sorted(
        ((key, w, _pr(key, w, seed)) for key, w in pop.items()),
        key=lambda t: (-t[2], t[0]),
    )
    return {t[0] for t in ranked[:k]}


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, float(w) if w is not None else None) for k, w in rows],
        "key string, w double",
    )


def _keys(df):
    return {r["key"] for r in df.collect()}


ROWS = [(f"doc-{i}", 1.0 + (i % 7)) for i in range(60)]


def test_sample_is_the_k_largest_priorities(spark):
    got = weighted_sample_keys(_df(spark, ROWS), "key", "w", 10)
    assert _keys(got) == _ref(ROWS, 10)
    # priorities come back alongside, matching the reference within ulps
    for r in got.collect():
        assert r["pr"] == pytest.approx(_pr(r["key"], r["w"]), rel=1e-12)


def test_duplicates_collapse_and_max_weight_wins(spark):
    rows = [("a", 2.0), ("a", 2.0), ("b", 1.0), ("a", 5.0), ("c", 3.0)]
    got = weighted_sample_keys(_df(spark, rows), "key", "w", 3)
    assert _keys(got) == _ref(rows, 3)
    a = {r["key"]: (r["w"], r["pr"]) for r in got.collect()}["a"]
    assert a == (5.0, pytest.approx(_pr("a", 5.0), rel=1e-12))


def test_null_zero_and_nan_weights_are_excluded(spark):
    rows = [("a", 1.0), ("z", None), ("y", 0.0), ("x", float("nan")), ("b", 2.0)]
    got = weighted_sample_keys(_df(spark, rows), "key", "w", 10)
    assert _keys(got) == {"a", "b"}


def test_negative_weight_raises_at_action_time(spark):
    df = _df(spark, [("a", 1.0), ("bad", -2.0)])
    out = weighted_sample_keys(df, "key", "w", 5)
    with pytest.raises(Exception, match="non-negative"):
        out.collect()


def test_heavier_keys_dominate_the_sample(spark):
    rows = [(f"h{i}", 50.0) for i in range(20)] + [
        (f"l{i}", 1.0) for i in range(180)
    ]
    got = _keys(weighted_sample_keys(_df(spark, rows), "key", "w", 20))
    heavy = sum(1 for k in got if k.startswith("h"))
    assert heavy >= 15  # E-S at 50:1 odds; deterministic given the hash


def test_seed_varies_the_draw_reproducibly(spark):
    df = _df(spark, ROWS)
    s0 = _keys(weighted_sample_keys(df, "key", "w", 8, seed=0))
    s1 = _keys(weighted_sample_keys(df, "key", "w", 8, seed=1))
    assert s0 == _ref(ROWS, 8, seed=0)
    assert s1 == _ref(ROWS, 8, seed=1)
    assert s0 != s1
    assert _keys(weighted_sample_keys(df, "key", "w", 8, seed=1)) == s1


def test_uniform_weights_full_k_is_a_deterministic_epoch_shuffle(spark):
    rows = [(f"d{i}", 1.0) for i in range(25)]
    df = _df(spark, rows)

    def order(seed):
        return [
            r["key"]
            for r in weighted_sample_keys(df, "key", "w", 25, seed=seed)
            .orderBy("pr", ascending=False)
            .collect()
        ]

    e0, e1 = order(0), order(1)
    assert sorted(e0) == sorted(e1) == sorted(k for k, _ in rows)
    assert e0 != e1  # a different epoch is a different permutation
    assert order(0) == e0  # and each epoch is reproducible


def test_stratified_sample_is_per_stratum(spark):
    rows = [(s, f"{s}-{i}", 1.0 + i % 3) for s in ("x", "y") for i in range(12)]
    df = spark.createDataFrame(rows, "src string, key string, w double")
    got = weighted_sample_keys(df, "key", "w", 4, ("src",)).collect()
    for s in ("x", "y"):
        part = {r["key"] for r in got if r["src"] == s}
        assert part == _ref([(f"{s}-{i}", 1.0 + i % 3) for i in range(12)], 4)


def test_deterministic_across_input_layouts(spark):
    a = _keys(weighted_sample_keys(_df(spark, ROWS), "key", "w", 7))
    b = _keys(
        weighted_sample_keys(
            _df(spark, list(reversed(ROWS))).repartition(7), "key", "w", 7
        )
    )
    assert a == b


@given(
    data=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=1, max_value=9),
            ),
            max_size=25,
        ),
        min_size=1,
        max_size=4,
    ),
    k=st.integers(min_value=1, max_value=8),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_algebra_is_exact_on_random_slicings(spark, data, k):
    """top-k-by-priority(union) == top-k of the slices' top-ks, for ANY
    slicing — the maintained store's never-rescan guarantee."""
    slices = [[(f"k{v}", float(w)) for v, w in s] for s in data]
    parts = None
    for s in slices:
        p = weighted_sample_keys(_df(spark, s), "key", "w", k)
        parts = p if parts is None else parts.unionByName(p)
    merged = _keys(merge_weighted_samples(parts, k))
    assert merged == _ref([x for s in slices for x in s], k)


def test_unstratified_plan_is_bounded_heaps_not_a_global_sort(spark):
    plan = (
        weighted_sample_keys(_df(spark, ROWS), "key", "w", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_maintained_store_equals_direct_over_ragged_batches(spark, tmp_path):
    ws = WeightedSample(
        spark, "key", "w", k=9, root=str(tmp_path / "s"), seed=3
    )
    cuts = [(0, 20), (20, 21), (21, 45), (45, 60)]
    for i, (lo, hi) in enumerate(cuts):
        ws.process_batch(_df(spark, ROWS[lo:hi]), i)
    assert _keys(ws.sample()) == _ref(ROWS, 9, seed=3)
    # crash replay: a batch overwrites its own directory, nothing changes
    ws.process_batch(_df(spark, ROWS[20:21]), 1)
    assert _keys(ws.sample()) == _ref(ROWS, 9, seed=3)
    # row fetch is the broadcast two-phase shape
    corpus = _df(spark, ROWS)
    fetched = ws.rows(corpus)
    assert _keys(fetched) == _ref(ROWS, 9, seed=3)
    plan = fetched._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
