"""Temperature mixture sampling (operators/mixture.py): integer targets
(waterfill + largest remainder) against hand-computed and property
invariants, the scale path's bit-equality to the windowed definition and
to a pure-Python md5 reference, determinism under input layout, the
boundary-bucket plan shape, and the store-answered form's equality to
the direct mix (plus its loud under-k failure)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from example_cdk_dynamodb_stream_to_redshift_spark.operators.mixture import (
    group_key_counts,
    mixture_from_sample,
    mixture_sample,
    mixture_sample_exact,
    mixture_targets,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.sample_maintenance import (
    BottomKSample,
    GroupCountStore,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ref_mix(rows, alpha, budget):
    """The definition, independently restated: per group, the target_g
    md5-smallest distinct keys, targets from mixture_targets over the
    distinct-key populations."""
    pops: dict[str, set[str]] = {}
    for g, k in rows:
        if g is None or k is None:
            continue
        pops.setdefault(str(g), set()).add(str(k))
    targets = mixture_targets({g: len(ks) for g, ks in pops.items()}, alpha, budget)
    out = set()
    for g, ks in pops.items():
        for key in sorted(ks, key=lambda x: (_md5(x), x))[: targets[g]]:
            out.add((g, key, _md5(key)))
    return out


def _df(spark, rows):
    return spark.createDataFrame(list(rows), "lang string, doc_id string")


def _got(df):
    return {(r["lang"], r["key"], r["h"]) for r in df.collect()}


# -- targets ----------------------------------------------------------------


def test_alpha_zero_waterfills_an_even_split():
    # even 20/20/20 overshoots c's population: c capped at 10, residual
    # 50 re-shared evenly over a and b
    assert mixture_targets({"a": 100, "b": 100, "c": 10}, 0.0, 60) == {
        "a": 25,
        "b": 25,
        "c": 10,
    }


def test_alpha_one_is_proportional():
    assert mixture_targets({"a": 30, "b": 10}, 1.0, 20) == {"a": 15, "b": 5}


def test_budget_beyond_population_keeps_everything():
    assert mixture_targets({"a": 3, "b": 7}, 0.5, 100) == {"a": 3, "b": 7}


def test_zero_budget_and_zero_count_groups():
    assert mixture_targets({"a": 5, "b": 0}, 1.0, 0) == {"a": 0, "b": 0}
    assert mixture_targets({"a": 5, "b": 0}, 0.0, 4) == {"a": 4, "b": 0}


def test_largest_remainder_ties_break_by_group_name():
    # raw = 2.5 / 2.5: one leftover unit goes to the lexicographically
    # smaller group, deterministically
    assert mixture_targets({"a": 10, "b": 10}, 1.0, 5) == {"a": 3, "b": 2}


def test_target_validation_is_loud():
    with pytest.raises(ValueError, match="alpha"):
        mixture_targets({"a": 1}, -0.1, 5)
    with pytest.raises(ValueError, match="budget"):
        mixture_targets({"a": 1}, 1.0, -5)
    with pytest.raises(ValueError, match="negative"):
        mixture_targets({"a": -1}, 1.0, 5)
    with pytest.raises(ValueError, match="duplicate"):
        mixture_targets({1: 3, "1": 4}, 1.0, 5)


@given(
    counts=st.dictionaries(
        st.text("abcdefgh", min_size=1, max_size=3),
        st.integers(min_value=0, max_value=500),
        min_size=1,
        max_size=8,
    ),
    alpha=st.floats(min_value=0.0, max_value=2.0, allow_nan=False),
    budget=st.integers(min_value=0, max_value=2000),
)
@settings(max_examples=60, deadline=None)
def test_target_invariants_on_random_inputs(counts, alpha, budget):
    t = mixture_targets(counts, alpha, budget)
    assert set(t) == set(counts)
    assert all(0 <= t[g] <= counts[g] for g in counts)
    assert sum(t.values()) == min(budget, sum(counts.values()))
    assert t == mixture_targets(counts, alpha, budget)  # deterministic


# -- sampling: scale path == window definition == pure-Python ----------------

ROWS = [
    (g, f"{g}-{i}")
    for g, n in (("en", 40), ("fr", 12), ("de", 5))
    for i in range(n)
] * 2  # duplicate rows: the population is DISTINCT keys


def test_both_paths_match_the_reference_and_each_other(spark):
    df = _df(spark, ROWS + [(None, "x"), ("en", None)])
    want = _ref_mix(ROWS, 0.3, 30)
    assert _got(mixture_sample_exact(df, "doc_id", "lang", 0.3, 30)) == want
    assert _got(mixture_sample(df, "doc_id", "lang", 0.3, 30)) == want


def test_precomputed_counts_frame_is_honored(spark):
    df = _df(spark, ROWS)
    counts = group_key_counts(df, "doc_id", "lang")
    want = _ref_mix(ROWS, 1.0, 20)
    assert _got(mixture_sample(df, "doc_id", "lang", 1.0, 20, counts=counts)) == want
    as_dict = {r["group"]: r["n"] for r in counts.collect()}
    assert (
        _got(mixture_sample_exact(df, "doc_id", "lang", 1.0, 20, counts=as_dict))
        == want
    )


def test_deterministic_across_input_layouts(spark):
    a = _got(mixture_sample(_df(spark, ROWS), "doc_id", "lang", 0.5, 25))
    b = _got(
        mixture_sample(
            _df(spark, list(reversed(ROWS))).repartition(7),
            "doc_id",
            "lang",
            0.5,
            25,
        )
    )
    assert a == b == _ref_mix(ROWS, 0.5, 25)


@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", "de", "ja"]),
            st.integers(min_value=0, max_value=60),
        ),
        min_size=0,
        max_size=60,
    ),
    alpha=st.floats(min_value=0.0, max_value=1.5, allow_nan=False),
    budget=st.integers(min_value=0, max_value=80),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scale_path_equals_exact_on_random_inputs(spark, data, alpha, budget):
    rows = [(g, f"k{v}") for g, v in data]
    df = _df(spark, rows)
    want = _ref_mix(rows, alpha, budget)
    assert _got(mixture_sample_exact(df, "doc_id", "lang", alpha, budget)) == want
    assert _got(mixture_sample(df, "doc_id", "lang", alpha, budget)) == want


def test_numeric_group_and_key_sample_as_strings(spark):
    rows = [(i % 3, i) for i in range(40)]
    df = spark.createDataFrame(rows, "lang int, doc_id long")
    want = _ref_mix([(str(g), str(k)) for g, k in rows], 0.7, 9)
    assert _got(mixture_sample(df, "doc_id", "lang", 0.7, 9)) == want


def test_scale_plan_ranks_only_the_boundary_bucket(spark):
    """The scale path's point, on the plan: the corpus-sized dedup frame
    is never globally ranked — the only Window over it sits above the
    boundary-bucket equality filter; the histogram/boundary control flow
    reaches the corpus via broadcast equi-joins (no SortMergeJoin, no
    BroadcastNestedLoopJoin)."""
    df = _df(spark, ROWS)
    out = mixture_sample(df, "doc_id", "lang", 0.5, 30)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # histogram cumsum under each union branch (column pruning
    # specializes the control subtrees) + the boundary-bucket rank
    assert plan.count(") Window") == 3
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- the store-answered form --------------------------------------------------


def _batches(rows, n):
    per = (len(rows) + n - 1) // n
    return [rows[i * per : (i + 1) * per] for i in range(n)]


def test_from_maintained_sample_equals_direct_mix(spark, tmp_path):
    store = BottomKSample(
        spark, "doc_id", k=25, root=str(tmp_path / "s"), strata_cols=("lang",)
    )
    for i, chunk in enumerate(_batches(ROWS, 3)):
        store.process_batch(_df(spark, chunk), i)
    counts = {
        r["group"]: r["n"]
        for r in group_key_counts(_df(spark, ROWS), "doc_id", "lang").collect()
    }
    got = _got(mixture_from_sample(store.sample(), counts, "lang", 0.4, 30))
    assert got == _ref_mix(ROWS, 0.4, 30)
    assert got == _got(mixture_sample(_df(spark, ROWS), "doc_id", "lang", 0.4, 30))


def test_from_sample_raises_when_the_store_is_under_k(spark, tmp_path):
    store = BottomKSample(
        spark, "doc_id", k=3, root=str(tmp_path / "s"), strata_cols=("lang",)
    )
    store.process_batch(_df(spark, ROWS), 0)
    counts = {"en": 40, "fr": 12, "de": 5}
    with pytest.raises(ValueError, match="k >= "):
        mixture_from_sample(store.sample(), counts, "lang", 1.0, 30)


def test_zero_scan_remix_from_maintained_state(spark, tmp_path):
    """The closed loop: counts from GroupCountStore + sample from
    BottomKSample answer the whole mix — targets AND kept keys — from
    store state alone, equal to the direct corpus mix. Keys are
    batch-unique (the deduplicated-corpus contract the count store
    documents)."""
    uniq = list(dict.fromkeys(ROWS))
    sampler = BottomKSample(
        spark, "doc_id", k=25, root=str(tmp_path / "s"), strata_cols=("lang",)
    )
    counter = GroupCountStore(spark, "lang", "doc_id", str(tmp_path / "s"))
    for i, chunk in enumerate(_batches(uniq, 3)):
        df = _df(spark, chunk)
        sampler.process_batch(df, i)
        counter.process_batch(df, i)
    got_counts = {r["group"]: r["n"] for r in counter.counts().collect()}
    assert got_counts == {"en": 40, "fr": 12, "de": 5}
    # crash-replayed batch: overwrite of its own directory, counts unchanged
    counter.process_batch(_df(spark, _batches(uniq, 3)[1]), 1)
    assert {r["group"]: r["n"] for r in counter.counts().collect()} == got_counts
    got = _got(
        mixture_from_sample(sampler.sample(), counter.counts(), "lang", 0.6, 28)
    )
    assert got == _ref_mix(uniq, 0.6, 28)
    assert got == _got(
        mixture_sample(_df(spark, uniq), "doc_id", "lang", 0.6, 28)
    )


def test_live_stream_composed_sampling_stack(spark, tmp_path):
    """Live readStream drive of gate.wrap(counter.wrap(sampler.wrap(
    ws.wrap(sink)))): the gate quarantines weight violators BEFORE they
    can poison the stores (a negative weight would raise inside the
    weighted sampler), every maintained artifact equals its direct
    definition over the landed-clean corpus, and the zero-scan re-mix
    matches the direct mix."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.expectations import (
        in_range,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.weighted_sample import (
        weighted_sample_keys,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.quality_monitor import (
        QualityGate,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.sample_maintenance import (
        WeightedSample,
    )

    schema = "lang string, doc_id string, w double"
    rows = [
        (g, f"{g}-{i}", -5.0 if i % 11 == 0 else float(10 + i % 5))
        for g, n in (("en", 40), ("fr", 30), ("de", 20))
        for i in range(n)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).repartition(4).write.parquet(src)

    gate = QualityGate(
        spark, [in_range("w", 1.0, 100.0)], str(tmp_path / "gate")
    )
    counter = GroupCountStore(spark, "lang", "doc_id", str(tmp_path / "st"))
    sampler = BottomKSample(
        spark, "doc_id", k=25, root=str(tmp_path / "st"), strata_cols=("lang",)
    )
    ws = WeightedSample(spark, "doc_id", "w", k=9, root=str(tmp_path / "st"))
    landed = str(tmp_path / "landed")
    sink = lambda df, bid: df.write.mode("overwrite").parquet(  # noqa: E731
        f"{landed}/batch_id={bid}"
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            gate.wrap(counter.wrap(sampler.wrap(ws.wrap(sink))))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120s"

    clean = [(g, d) for g, d, w in rows if w >= 1.0]
    corpus = spark.read.parquet(landed)
    assert corpus.count() == len(clean)
    # maintained counts == direct populations of the clean corpus
    want_counts = {r["group"]: r["n"] for r in group_key_counts(corpus, "doc_id", "lang").collect()}
    assert {r["group"]: r["n"] for r in counter.counts().collect()} == want_counts
    # zero-scan re-mix == direct mix over the landed-clean corpus
    got = _got(
        mixture_from_sample(sampler.sample(), counter.counts(), "lang", 0.5, 30)
    )
    assert got == _ref_mix(clean, 0.5, 30)
    assert got == _got(mixture_sample(corpus, "doc_id", "lang", 0.5, 30))
    # maintained weighted sample == direct over the landed-clean corpus
    direct_ws = {
        r["key"] for r in weighted_sample_keys(corpus, "doc_id", "w", 9).collect()
    }
    assert {r["key"] for r in ws.sample().collect()} == direct_ws


def test_from_sample_ignores_missing_store_groups_with_zero_targets(
    spark, tmp_path
):
    """A group whose target is 0 needs nothing from the store — its
    absence there must not trip the sufficiency check."""
    store = BottomKSample(
        spark, "doc_id", k=10, root=str(tmp_path / "s"), strata_cols=("lang",)
    )
    only_en = [(g, k) for g, k in ROWS if g == "en"]
    store.process_batch(_df(spark, only_en), 0)
    got = _got(
        mixture_from_sample(store.sample(), {"en": 40, "zz": 0}, "lang", 1.0, 8)
    )
    assert got == _ref_mix(only_en, 1.0, 8)
