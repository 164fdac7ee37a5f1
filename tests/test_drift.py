"""Drift detection (operators/drift.py): one-scan histogram profiles,
PSI pinned against an independent numpy reference, declared-bucket
invariants (nulls and unseen categories are buckets, zero-count buckets
materialize), and a real-tables smoke over the events fixture."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.drift import (
    NAN_BUCKET,
    NULL_BUCKET,
    OTHER_BUCKET,
    CategoricalProfile,
    NumericProfile,
    profile,
    psi_report,
    suggest_edges,
)

SCHEMA = "v double, cat string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


SPECS = [
    NumericProfile("v", (0.0, 10.0, 100.0)),
    CategoricalProfile("cat", ("a", "b")),
]


def _counts(prof):
    return {(r["column"], r["bucket"]): r["cnt"] for r in prof.collect()}


def test_profile_counts_and_full_support(spark):
    df = _df(
        spark,
        [
            (-3.0, "a"),   # v: (-inf,0)        cat: a
            (0.0, "b"),    # v: [0,10)  (left-closed)
            (9.9, "zzz"),  # cat outside domain -> __other__
            (10.0, None),  # v: [10,100)        cat null
            (250.0, "a"),  # v: [100,inf)
            (None, "a"),   # v null
        ],
    )
    got = _counts(profile(df, SPECS))
    assert got[("v", "[-inf,0.0)")] == 1
    assert got[("v", "[0.0,10.0)")] == 2
    assert got[("v", "[10.0,100.0)")] == 1
    assert got[("v", "[100.0,inf)")] == 1
    assert got[("v", NULL_BUCKET)] == 1
    assert got[("cat", "a")] == 3
    assert got[("cat", "b")] == 1
    assert got[("cat", OTHER_BUCKET)] == 1
    assert got[("cat", NULL_BUCKET)] == 1
    # per column, counts partition the table
    assert sum(v for (c, _), v in got.items() if c == "v") == 6
    assert sum(v for (c, _), v in got.items() if c == "cat") == 6


def test_zero_count_buckets_materialize(spark):
    got = _counts(profile(_df(spark, [(5.0, "a")]), SPECS))
    # every declared bucket present, most at zero
    assert len(got) == (4 + 2) + (2 + 2)
    assert got[("v", "[-inf,0.0)")] == 0
    assert got[("cat", "b")] == 0


def test_nan_gets_its_own_bucket_not_the_top_bin(spark):
    """Spark orders NaN greater than any number, so without the explicit
    isnan probe every `c >= edge` comparison is true and NaN rows count
    as top-bin data — a column shifting 0% -> 30% NaN would read as
    high-value drift (ADVICE r8). NaN is its own declared bucket, NULL
    stays separate."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.drift import (
        NAN_BUCKET,
    )

    df = _df(
        spark,
        [(float("nan"), "a"), (float("nan"), "a"), (250.0, "a"), (None, "a")],
    )
    got = _counts(profile(df, SPECS))
    assert got[("v", NAN_BUCKET)] == 2
    assert got[("v", "[100.0,inf)")] == 1  # only the genuine top-bin row
    assert got[("v", NULL_BUCKET)] == 1
    # NaN appearing 0% -> 50% moves PSI even when real values are stable
    base = profile(
        _df(spark, [(250.0, "a"), (5.0, "a")] * 10), SPECS
    )
    cur = profile(
        _df(spark, [(250.0, "a"), (float("nan"), "a")] * 10), SPECS
    )
    row = {r["column"]: r for r in psi_report(cur, base).collect()}
    assert row["v"]["drifted"] is True


def test_profile_is_one_scan(spark, tmp_path):
    src = str(tmp_path / "t")
    _df(spark, [(float(i), "a") for i in range(100)]).write.parquet(src)
    prof = profile(spark.read.parquet(src), SPECS)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_psi_matches_numpy_reference(spark):
    import numpy as np

    base_rows = [(float(i % 20), "a" if i % 3 else "b") for i in range(300)]
    cur_rows = [(float(i % 40), "a" if i % 7 else "zzz") for i in range(200)]
    base_p = profile(_df(spark, base_rows), SPECS)
    cur_p = profile(_df(spark, cur_rows), SPECS)
    got = {r["column"]: r for r in psi_report(cur_p, base_p, eps=1e-6).collect()}

    bc, cc = _counts(base_p), _counts(cur_p)
    for col in ("v", "cat"):
        buckets = sorted({b for (c, b) in set(bc) | set(cc) if c == col})
        nb = sum(bc.get((col, b), 0) for b in buckets)
        nc = sum(cc.get((col, b), 0) for b in buckets)
        pb = np.maximum(
            np.array([bc.get((col, b), 0) for b in buckets]) / max(nb, 1), 1e-6
        )
        pc = np.maximum(
            np.array([cc.get((col, b), 0) for b in buckets]) / max(nc, 1), 1e-6
        )
        want = float(np.sum((pc - pb) * np.log(pc / pb)))
        assert got[col]["psi"] == pytest.approx(want, rel=1e-12)
        assert got[col]["n_current"] == nc and got[col]["n_baseline"] == nb
    # the injected shifts are large enough to cross the 0.2 default
    assert got["v"]["drifted"] and got["cat"]["drifted"]


def test_identical_distributions_have_zero_psi(spark):
    rows = [(float(i % 15), "a" if i % 2 else "b") for i in range(100)]
    p1 = profile(_df(spark, rows), SPECS)
    p2 = profile(_df(spark, rows), SPECS)
    for r in psi_report(p1, p2).collect():
        assert r["psi"] == pytest.approx(0.0, abs=1e-12)
        assert not r["drifted"]


def test_null_rate_shift_is_drift(spark):
    base = [(5.0, "a")] * 100
    cur = [(5.0, "a")] * 70 + [(None, "a")] * 30  # 0% -> 30% nulls in v
    rep = {
        r["column"]: r
        for r in psi_report(
            profile(_df(spark, cur), SPECS), profile(_df(spark, base), SPECS)
        ).collect()
    }
    assert rep["v"]["drifted"]
    assert not rep["cat"]["drifted"]


def test_spec_validation_is_loud(spark):
    with pytest.raises(ValueError, match="sorted"):
        NumericProfile("v", (10.0, 0.0))
    with pytest.raises(ValueError, match="unique"):
        CategoricalProfile("cat", ("a", "a"))
    with pytest.raises(ValueError, match="duplicate columns"):
        profile(_df(spark, []), [NumericProfile("v", (0.0,)),
                                 NumericProfile("v", (1.0,))])


def test_empty_specs_and_empty_frame(spark):
    assert profile(_df(spark, [(1.0, "a")]), []).count() == 0
    prof = profile(_df(spark, []), SPECS)
    assert all(r["cnt"] == 0 for r in prof.collect())


def test_suggest_edges_then_monitor_events(spark):
    """The freeze-baseline-then-monitor loop on the real events table:
    edges derived once from the full table, then a filtered slice
    (purchases only) scored against the full-table baseline — value is
    type-correlated in the fixture, so the slice must register drift on
    event_type and a finite PSI on value."""
    from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import (
        load_table,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    edges = suggest_edges(events, "value", n_bins=8)
    assert edges == tuple(sorted(set(edges))) and len(edges) >= 1
    specs = [
        NumericProfile("value", edges),
        CategoricalProfile("event_type", ("click", "view", "purchase")),
    ]
    baseline = profile(events, specs)
    slice_ = profile(events.filter(F.col("event_type") == "purchase"), specs)
    rep = {r["column"]: r for r in psi_report(slice_, baseline).collect()}
    assert rep["event_type"]["drifted"]  # 100% purchase vs mixed baseline
    assert math.isfinite(rep["value"]["psi"])


# ---------------------------------------------------------------------------
# streaming/drift_maintenance.py — the micro-batch-maintained profile store
# ---------------------------------------------------------------------------


def _monitor(spark, tmp_path, name="mon"):
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.drift_maintenance import (
        ProfileMonitor,
    )

    return ProfileMonitor(spark, SPECS, str(tmp_path / name))


def test_maintained_profile_equals_direct_regardless_of_slicing(spark, tmp_path):
    """Count algebra is exact under union: the cumulative profile after
    N batches equals profiling all the data at once, however the rows
    were sliced."""
    rows = [(float(i % 25), "a" if i % 3 else "b") for i in range(90)]
    mon = _monitor(spark, tmp_path)
    for bid, lo in enumerate(range(0, 90, 17)):  # uneven batch sizes
        mon.process_batch(_df(spark, rows[lo:lo + 17]), bid)
    got = _counts(mon.cumulative_profile())
    want = _counts(profile(_df(spark, rows), SPECS))
    assert got == want


def test_maintained_profile_replay_idempotent(spark, tmp_path):
    rows = [(float(i), "a") for i in range(20)]
    mon = _monitor(spark, tmp_path)
    mon.process_batch(_df(spark, rows[:10]), 0)
    mon.process_batch(_df(spark, rows[10:]), 1)
    before = _counts(mon.cumulative_profile())
    mon.process_batch(_df(spark, rows[10:]), 1)  # at-least-once replay
    assert _counts(mon.cumulative_profile()) == before


def test_trend_localizes_the_shift_to_the_batch_that_drifted(spark, tmp_path):
    base_rows = [(float(i % 10), "a" if i % 2 else "b") for i in range(200)]
    baseline = profile(_df(spark, base_rows), SPECS)
    mon = _monitor(spark, tmp_path)
    mon.process_batch(_df(spark, base_rows[:100]), 0)       # same dist
    shifted = [(500.0, "zzz")] * 100                        # very different
    mon.process_batch(_df(spark, shifted), 1)
    trend = {
        (r["batch_id"], r["column"]): r for r in mon.trend(baseline).collect()
    }
    assert not trend[(0, "v")]["drifted"] and not trend[(0, "cat")]["drifted"]
    assert trend[(1, "v")]["drifted"] and trend[(1, "cat")]["drifted"]
    # emitted column ORDER matches the documented contract — positional
    # consumers (tuple unpacking, toPandas().values) rely on it (ADVICE r8)
    assert mon.trend(baseline).columns == [
        "batch_id", "column", "psi", "n_current", "n_baseline", "drifted",
    ]
    # cumulative view also registers the shift
    cum = {r["column"]: r for r in mon.cumulative_report(baseline).collect()}
    assert cum["v"]["psi"] > 0


def test_monitor_streams_and_composes_with_quality_gate(spark, tmp_path):
    """Live readStream drive of gate.wrap(monitor.wrap(sink)): the gate
    quarantines contract violators, the monitor profiles only the CLEAN
    rows (clean profile total == clean row count), and the sink still
    receives every clean row."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.expectations import (
        in_range,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.quality_monitor import (
        QualityGate,
    )

    src = str(tmp_path / "src")
    rows = [(1000.0 if i % 10 == 0 else float(i % 30), "a" if i % 2 else "b")
            for i in range(80)]
    _df(spark, rows).repartition(4).write.parquet(src)

    gate = QualityGate(
        spark, [in_range("v", 0.0, 100.0)], str(tmp_path / "gate")
    )
    mon = _monitor(spark, tmp_path, "stream_mon")
    landed = str(tmp_path / "landed")
    sink = lambda df, bid: df.write.mode("overwrite").parquet(  # noqa: E731
        f"{landed}/batch_id={bid}"
    )
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(gate.wrap(mon.wrap(sink)))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    n_clean = spark.read.parquet(landed).count()
    assert n_clean == sum(1 for v, _ in rows if 0.0 <= v <= 100.0)
    cum = _counts(mon.cumulative_profile())
    assert sum(v for (c, _), v in cum.items() if c == "v") == n_clean
    # the monitor never saw the quarantined out-of-range rows
    assert cum[("v", "[100.0,inf)")] == 0
    n_batches = mon.profiles().select("batch_id").distinct().count()
    assert n_batches >= 2
    before = _counts(mon.cumulative_profile())
    mon.compact(keep_last=1)
    assert _counts(mon.cumulative_profile()) == before


def test_monitor_empty_store_and_spec_guard(spark, tmp_path):
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.drift_maintenance import (
        ProfileMonitor,
    )

    with pytest.raises(ValueError, match="at least one"):
        ProfileMonitor(spark, [], str(tmp_path / "x"))
    mon = _monitor(spark, tmp_path, "empty")
    assert mon.profiles().count() == 0
    assert mon.trend(profile(_df(spark, [(1.0, "a")]), SPECS)).count() == 0


def test_int_and_float_spelled_edges_are_identical_specs(spark):
    """Edges round-tripped through JSON as ints must produce the SAME
    bucket labels as float-spelled edges — otherwise the PSI join
    matches nothing and identical data scores as total drift (r8
    review finding)."""
    int_spec = [NumericProfile("v", (0, 10, 100)), SPECS[1]]
    rows = [(float(i % 30), "a") for i in range(50)]
    p_int = profile(_df(spark, rows), int_spec)
    p_float = profile(_df(spark, rows), SPECS)
    assert _counts(p_int) == _counts(p_float)
    for r in psi_report(p_int, p_float).collect():
        assert r["psi"] == pytest.approx(0.0, abs=1e-12) and not r["drifted"]


def test_empty_side_scores_null_psi_not_drift(spark, tmp_path):
    """An empty current slice (idle micro-batch) has no distribution to
    compare: psi must be NULL / drifted false, not a saturated
    every-column alert (r8 review finding) — both in psi_report and in
    the maintained trend."""
    baseline = profile(_df(spark, [(5.0, "a")] * 100), SPECS)
    empty_cur = profile(_df(spark, []), SPECS)
    for r in psi_report(empty_cur, baseline).collect():
        assert r["psi"] is None and not r["drifted"] and r["n_current"] == 0
    # reversed: empty BASELINE also refuses to cry drift
    for r in psi_report(baseline, empty_cur).collect():
        assert r["psi"] is None and not r["drifted"]

    mon = _monitor(spark, tmp_path, "idle_mon")
    mon.process_batch(_df(spark, [(5.0, "a")] * 10), 0)
    mon.process_batch(_df(spark, []), 1)  # idle trigger
    trend = {
        (r["batch_id"], r["column"]): r for r in mon.trend(baseline).collect()
    }
    assert not trend[(0, "v")]["drifted"]
    assert trend[(1, "v")]["psi"] is None and not trend[(1, "v")]["drifted"]


def test_trend_plan_is_bounded_in_batch_count(spark, tmp_path):
    """trend() must compile ONE join + one grouped aggregation however
    many batches have landed — the per-batch-id union grew the Catalyst
    plan O(B) with stream lifetime (r8 review finding)."""
    baseline = profile(_df(spark, [(5.0, "a")] * 50), SPECS)

    def join_count(mon):
        plan = (
            mon.trend(baseline)._jdf.queryExecution().executedPlan().toString()
        )
        return sum(
            plan.count(j)
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        )

    small = _monitor(spark, tmp_path, "few_batches")
    for bid in range(2):
        small.process_batch(_df(spark, [(float(bid), "a")] * 5), bid)
    big = _monitor(spark, tmp_path, "many_batches")
    for bid in range(12):
        big.process_batch(_df(spark, [(float(bid), "a")] * 5), bid)
    # the CONSTANT that matters: 6x the batches, identical join count
    # (the old per-batch-id union compiled ~2 joins per batch)
    assert join_count(big) == join_count(small) <= 3
    assert big.trend(baseline).count() == 12 * 2  # every batch scored


# ---------------------------------------------------------------------------
# hypothesis property tests (the rangejoin/KMV r7 pattern)
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.just(float("nan")),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=0,
        max_size=40,
    ),
    edges=st.lists(
        st.integers(min_value=-100, max_value=100),
        min_size=1, max_size=6, unique=True,
    ),
)
def test_profile_matches_numpy_binning_on_random_inputs(spark, vals, edges):
    """profile()'s left-closed binning == an independent numpy/python
    derivation for arbitrary floats (boundaries, negatives, nulls) and
    arbitrary edge sets — and counts always partition the input."""
    edges = tuple(sorted(edges))
    spec = NumericProfile("v", edges)
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {
        r["bucket"]: r["cnt"] for r in profile(df, [spec]).collect()
    }
    # independent reference: bucket index = count(edges <= v)
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.drift import (
        _numeric_labels,
    )

    labels = _numeric_labels(spec.edges)
    want = {lab: 0 for lab in labels}
    want[NULL_BUCKET] = 0
    want[NAN_BUCKET] = 0
    for v in vals:
        if v is None:
            want[NULL_BUCKET] += 1
        elif v != v:  # NaN: its own bucket, never a bin (ADVICE r8)
            want[NAN_BUCKET] += 1
        else:
            idx = sum(1 for e in spec.edges if v >= e)
            want[labels[idx]] += 1
    assert got == want
    assert sum(got.values()) == len(vals)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(min_value=-1e3, max_value=1e3,
                                           allow_nan=False)),
            st.one_of(st.none(), st.sampled_from(["a", "b", "weird"])),
        ),
        min_size=0,
        max_size=30,
    ),
    lo=st.integers(min_value=-10, max_value=0),
    hi=st.integers(min_value=1, max_value=500),
)
def test_gate_partition_invariant_on_random_inputs(spark, tmp_path, rows, lo, hi):
    """For ANY batch and range bounds: clean + quarantined partition the
    batch exactly, blame only names genuinely-failed checks, and the
    report's violation counts equal the quarantine's blame tallies for
    row-level checks."""
    import uuid

    from example_cdk_dynamodb_stream_to_redshift_spark.operators.expectations import (
        in_range,
        not_null,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.quality_monitor import (
        QualityGate,
    )

    checks = [not_null("cat"), in_range("v", float(lo), float(hi))]
    gate = QualityGate(
        spark, checks, str(tmp_path / f"g{uuid.uuid4().hex[:8]}")
    )
    batch = spark.createDataFrame(rows, "v double, cat string")
    stats = gate.process_batch(batch, 0)
    assert stats["n_clean"] + stats["n_quarantined"] == stats["n_rows"] == len(rows)
    want_null = sum(1 for _, c in rows if c is None)
    want_range = sum(
        1 for v, _ in rows if v is not None and not (lo <= v <= hi)
    )
    rep = {r["check"]: r["violations"] for r in gate.report().collect()}
    assert rep["not_null(cat)"] == want_null
    assert rep[f"in_range(v,{float(lo)},{float(hi)})"] == want_range
    q = gate.quarantine(empty_like=batch).collect()
    blame_null = sum(1 for r in q if "not_null(cat)" in r["failed_checks"])
    assert blame_null == want_null
    assert stats["n_quarantined"] == len(q)
