"""Bottom-k uniform samples (operators/bottomk.py +
streaming/sample_maintenance.py): the sample IS the k hash-smallest
distinct keys (pure-Python md5 reference), merge algebra is exact on
random slicings, determinism under input layout, the two-phase
row-fetch plan, the KMV estimate, and the maintained store's
replay/compaction behavior."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.bottomk import (
    bottomk_keys,
    distinct_estimate,
    merge_samples,
    sample_rows,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.sample_maintenance import (
    BottomKSample,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ref_sample(keys, k):
    """The definition, independently restated: k md5-smallest distinct
    non-null keys, as (key, h) pairs."""
    distinct = sorted({str(x) for x in keys if x is not None}, key=_md5)
    return {(key, _md5(key)) for key in distinct[:k]}


def _df(spark, keys):
    return spark.createDataFrame([(x,) for x in keys], "key string")


def test_sample_is_the_k_hash_smallest_distinct_keys(spark):
    keys = ["a", "b", "c", "d", "e", "a", "b", None, "f", "g", "a"]
    got = {
        (r["key"], r["h"])
        for r in bottomk_keys(_df(spark, keys), "key", 4).collect()
    }
    assert got == _ref_sample(keys, 4)


def test_numeric_keys_sample_as_their_string_form(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(50)], "key long")
    got = {(r["key"], r["h"]) for r in bottomk_keys(df, "key", 3).collect()}
    assert got == _ref_sample([i % 7 for i in range(50)], 3)


def test_stratified_sample_is_per_stratum(spark):
    rows = [(s, f"{s}-{i}") for s in ("x", "y") for i in range(10)]
    df = spark.createDataFrame(rows, "src string, key string")
    got = bottomk_keys(df, "key", 3, ("src",)).collect()
    for s in ("x", "y"):
        part = {(r["key"], r["h"]) for r in got if r["src"] == s}
        assert part == _ref_sample([f"{s}-{i}" for i in range(10)], 3)


def test_deterministic_across_input_layouts(spark):
    keys = [f"k{i % 13}" for i in range(60)]
    a = sorted(map(tuple, bottomk_keys(_df(spark, keys), "key", 5).collect()))
    b = sorted(
        map(
            tuple,
            bottomk_keys(
                _df(spark, list(reversed(keys))).repartition(7), "key", 5
            ).collect(),
        )
    )
    assert a == b


@given(
    data=st.lists(
        st.lists(st.integers(min_value=0, max_value=30), max_size=25),
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
    """min-k(union) == min-k of the slices' min-ks, for ANY slicing —
    the property the maintained store's never-rescan guarantee rests
    on."""
    slices = [[f"k{v}" for v in s] for s in data]
    parts = None
    for i, s in enumerate(slices):
        p = bottomk_keys(_df(spark, s), "key", k).withColumn(
            "batch_id", F.lit(i)
        )
        parts = p if parts is None else parts.unionByName(p)
    merged = {
        (r["key"], r["h"])
        for r in merge_samples(parts.drop("batch_id"), k).collect()
    }
    assert merged == _ref_sample([x for s in slices for x in s], k)


def test_unstratified_plan_is_bounded_heaps_not_a_global_sort(spark):
    plan = (
        bottomk_keys(_df(spark, ["a", "b", "c"]), "key", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort node anywhere


def test_sample_rows_is_a_broadcast_semi_join(spark):
    corpus = spark.createDataFrame(
        [(f"k{i}", i) for i in range(20)], "key string, payload int"
    )
    samp = bottomk_keys(corpus, "key", 4)
    fetched = sample_rows(corpus, samp, "key")
    keys = {r["key"] for r in samp.collect()}
    assert {r["key"] for r in fetched.collect()} == keys
    assert fetched.columns == ["key", "payload"]
    plan = fetched._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_distinct_estimate_exact_when_underfull_and_close_when_full(spark):
    small = bottomk_keys(_df(spark, [f"k{i}" for i in range(5)]), "key", 64)
    [r] = distinct_estimate(small, 64).collect()
    assert r["distinct_est"] == 5.0  # under-full: exact
    big_keys = [f"doc-{i}" for i in range(500)]
    big = bottomk_keys(_df(spark, big_keys), "key", 64)
    [r] = distinct_estimate(big, 64).collect()
    assert 500 * 0.7 <= r["distinct_est"] <= 500 * 1.3, r["distinct_est"]


def test_k_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="k must be"):
        bottomk_keys(_df(spark, ["a"]), "key", 0)
    with pytest.raises(ValueError, match="k must be"):
        BottomKSample(spark, "key", 0, str(tmp_path / "x"))


def test_store_maintains_replays_and_compacts(spark, tmp_path):
    store = BottomKSample(spark, "key", 3, str(tmp_path / "bk"))
    slices = [
        [f"k{i}" for i in range(8)],
        [],  # idle batch
        [f"k{i}" for i in range(5, 15)] + ["k1"],
    ]
    for i, s in enumerate(slices):
        store.process_batch(_df(spark, s), i)
    all_keys = [x for s in slices for x in s]
    want = _ref_sample(all_keys, 3)
    before = {(r["key"], r["h"]) for r in store.sample().collect()}
    assert before == want
    # store growth bound: <= k rows per batch
    per_batch = {
        r["batch_id"]: r["n"]
        for r in store.partials()
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(n <= 3 for n in per_batch.values()), per_batch
    # replay idempotence
    store.process_batch(_df(spark, slices[0]), 0)
    assert {(r["key"], r["h"]) for r in store.sample().collect()} == want
    # compaction preserves the merged sample
    store.compact(keep_last=1)
    assert {(r["key"], r["h"]) for r in store.sample().collect()} == want
    # two-phase row fetch returns exactly the sampled keys' rows
    corpus = _df(spark, sorted(set(all_keys)))
    got = {r["key"] for r in store.rows(corpus).collect()}
    assert got == {k for k, _ in want}
    # under-full stratum-less estimate is exact over landed distinct keys
    # (k=3 < 15 distinct, so this one is the estimator path: just bounded)
    [r] = store.distinct_estimate().collect()
    assert r["distinct_est"] > 0


def test_stratified_store_schema_is_stable_and_per_stratum(spark, tmp_path):
    store = BottomKSample(
        spark, "key", 2, str(tmp_path / "bks"), strata_cols=("src",)
    )
    empty = store.sample()
    assert empty.columns == ["src", "key", "h"] and empty.count() == 0
    rows = [(s, f"{s}-{i}") for s in ("x", "y") for i in range(6)]
    df = spark.createDataFrame(rows, "src string, key string")
    store.process_batch(df, 0)
    store.process_batch(df.filter("src = 'x'"), 1)
    got = store.sample().collect()
    assert {r["src"] for r in got} == {"x", "y"}
    for s in ("x", "y"):
        part = {(r["key"], r["h"]) for r in got if r["src"] == s}
        assert part == _ref_sample([f"{s}-{i}" for i in range(6)], 2)
