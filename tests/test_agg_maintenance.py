"""Incremental aggregate maintenance (streaming/agg_maintenance.py):
merge algebra vs full recompute, exactly-once replay, streaming e2e."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from example_cdk_dynamodb_stream_to_redshift_spark.streaming.agg_maintenance import (
    IncrementalAggTable,
)

AGGS = [
    ("n_events", "count", None),
    ("total_value", "sum", "value"),
    ("min_value", "min", "value"),
    ("max_value", "max", "value"),
]


def _mk(spark, path):
    return IncrementalAggTable(
        spark,
        path,
        key_cols=["user_id"],
        key_types=[T.LongType()],
        aggs=AGGS,
        out_types={
            "total_value": T.DecimalType(18, 2),
            "min_value": T.DoubleType(),
            "max_value": T.DoubleType(),
        },
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "user_id long, value double")


def _state(t):
    return {
        r["user_id"]: (
            r["n_events"],
            float(r["total_value"]),
            r["min_value"],
            r["max_value"],
        )
        for r in t.read().collect()
    }


def test_incremental_equals_full_recompute(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "mv"))
    batches = [
        [(1, 10.0), (1, 2.5), (2, -4.0)],
        [(2, 7.0), (3, 0.25)],          # new group 3; 1 absent this batch
        [(1, -100.0), (3, 0.25), (3, 99.0)],
    ]
    seen = []
    for i, rows in enumerate(batches):
        assert t.apply_batch(_batch(spark, rows), i) is True
        seen.extend(rows)
        want = {
            r["user_id"]: (
                r["n"], float(r["s"]), r["mn"], r["mx"]
            )
            for r in _batch(spark, seen)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )
            .collect()
        }
        assert _state(t) == want, f"divergence after batch {i}"
    # derived average reads off the mergeable components
    avg = {
        r["user_id"]: r["avg_value"]
        for r in t.read_with_avg("avg_value", "total_value", "n_events").collect()
    }
    assert avg[3] == (0.25 + 0.25 + 99.0) / 3


def test_replay_is_exactly_once(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "mv"))
    b0 = _batch(spark, [(1, 5.0), (2, 1.0)])
    assert t.apply_batch(b0, 0) is True
    before = _state(t)
    assert t.apply_batch(b0, 0) is False  # at-least-once replay: no-op
    assert _state(t) == before
    # an OLDER id replayed after newer batches is also a no-op
    assert t.apply_batch(_batch(spark, [(1, 1.0)]), 1) is True
    assert t.apply_batch(b0, 0) is False
    assert t.last_applied() == 1


def test_crash_before_pointer_flip_is_recoverable(spark, tmp_path):
    """A state-version directory written WITHOUT the pointer flip (crash
    window) is invisible; the retry re-applies onto the old state."""
    t = _mk(spark, str(tmp_path / "mv"))
    t.apply_batch(_batch(spark, [(1, 5.0)]), 0)
    before = _state(t)
    # simulate the crash: write the would-be v2 data but keep the pointer
    ptr = os.path.join(str(tmp_path / "mv"), "_CURRENT")
    saved = open(ptr).read()
    t.apply_batch(_batch(spark, [(1, 3.0)]), 1)
    with open(ptr, "w") as fh:
        fh.write(saved)  # roll the pointer back = crash before flip
    assert _state(t) == before
    assert t.last_applied() == 0
    # the foreachBatch retry re-delivers batch 1: applies cleanly once
    assert t.apply_batch(_batch(spark, [(1, 3.0)]), 1) is True
    assert _state(t)[1] == (2, 8.0, 3.0, 5.0)


def test_streaming_foreach_batch_e2e(spark, tmp_path):
    """Real readStream -> foreachBatch maintenance across two refreshes;
    the second refresh is incremental (checkpointed file source)."""
    inp = tmp_path / "in"
    inp.mkdir()
    t = _mk(spark, str(tmp_path / "mv"))

    def refresh():
        q = (
            spark.readStream.schema("user_id long, value double")
            .json(str(inp))
            .writeStream.foreachBatch(t.foreach_batch())
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with open(inp / "b0.json", "w") as fh:
        for u, v in [(1, 2.0), (1, 3.0), (2, 10.0)]:
            fh.write(json.dumps({"user_id": u, "value": v}) + "\n")
    refresh()
    assert _state(t) == {1: (2, 5.0, 2.0, 3.0), 2: (1, 10.0, 10.0, 10.0)}

    with open(inp / "b1.json", "w") as fh:
        fh.write(json.dumps({"user_id": 2, "value": -1.0}) + "\n")
    refresh()
    assert _state(t) == {1: (2, 5.0, 2.0, 3.0), 2: (2, 9.0, -1.0, 10.0)}
    assert t.last_applied() == 1


def test_multi_key_groups(spark, tmp_path):
    t = IncrementalAggTable(
        spark,
        str(tmp_path / "mv"),
        key_cols=["user_id", "kind"],
        key_types=[T.LongType(), T.StringType()],
        aggs=[("n", "count", None), ("mx", "max", "value")],
        out_types={"mx": T.DoubleType()},
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id long, kind string, value double"
    )
    t.apply_batch(mk([(1, "a", 5.0), (1, "b", 2.0), (1, "a", 7.0)]), 0)
    t.apply_batch(mk([(1, "a", 1.0), (2, "a", 9.0)]), 1)
    got = {
        (r["user_id"], r["kind"]): (r["n"], r["mx"])
        for r in t.read().collect()
    }
    assert got == {(1, "a"): (3, 7.0), (1, "b"): (1, 2.0), (2, "a"): (1, 9.0)}


def test_unsupported_aggregate_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="unsupported aggregate"):
        IncrementalAggTable(
            spark,
            str(tmp_path / "mv"),
            key_cols=["k"],
            key_types=[T.LongType()],
            aggs=[("a", "avg", "v")],  # avg is derived, not mergeable
        )


def test_approx_distinct_sketches_merge_losslessly(spark, tmp_path):
    """Maintained HLL distinct-user counts: after N batches the estimate
    sits within the sketch's error bound of the exact distinct, and
    re-applying a batch (replay) leaves the sketch state byte-identical.
    (Union estimates may differ a fraction of a percent from a one-shot
    sketch — the HIP estimator is ingestion-path-dependent — so EXACT
    equality is asserted against the error bound, not the one-shot.)"""
    t = IncrementalAggTable(
        spark,
        str(tmp_path / "mv"),
        key_cols=["kind"],
        key_types=[T.StringType()],
        aggs=[("n", "count", None), ("users", "approx_distinct", "user_id")],
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "kind string, user_id long"
    )
    batches = [
        [("a", i) for i in range(300)] + [("b", i) for i in range(50)],
        [("a", i) for i in range(200, 500)],       # half overlaps batch 0
        [("b", i) for i in range(50, 120)] + [("a", 0)],
    ]
    for i, rows in enumerate(batches):
        t.apply_batch(mk(rows), i)
    got = {
        r["kind"]: r["n_users"]
        for r in t.read_with_distinct("n_users", "users").collect()
    }
    exact = {"a": 500, "b": 120}
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est)
    # replay leaves state byte-identical (exactly-once ledger)
    before = {r["kind"]: bytes(r["users"]) for r in t.read().collect()}
    assert t.apply_batch(mk(batches[-1]), 2) is False
    after = {r["kind"]: bytes(r["users"]) for r in t.read().collect()}
    assert after == before


# -- CDC retraction (delta) mode ------------------------------------------


def _mk_delta(spark, path):
    return IncrementalAggTable(
        spark,
        path,
        key_cols=["member_id"],
        key_types=[T.StringType()],
        aggs=[("n_quests", "count", None), ("total", "sum", "dollars")],
        out_types={"total": T.DecimalType(18, 2)},
        retractable=True,
    )


def _delta(spark, rows):
    """rows: (member_id, dollars, weight)"""
    return spark.createDataFrame(
        rows, "member_id string, dollars double, _weight long"
    )


def _delta_state(t):
    return {
        r["member_id"]: (r["n_quests"], float(r["total"]))
        for r in t.read().collect()
    }


def test_delta_mode_matches_recompute(spark, tmp_path):
    """Maintain through INSERT / MODIFY (old -1 + new +1) / REMOVE and
    compare against the from-scratch GROUP BY over the live row set after
    every batch — including deletion of a group whose support empties."""
    t = _mk_delta(spark, str(tmp_path / "mv"))
    live: dict[str, list[float]] = {}  # member -> live quest dollars

    def apply(batch_id, rows):
        assert t.apply_delta(_delta(spark, rows), batch_id) is True
        for m, v, w in rows:
            live.setdefault(m, [])
            if w > 0:
                live[m].append(v)
            else:
                live[m].remove(v)
        want = {
            m: (len(vs), round(sum(vs), 2)) for m, vs in live.items() if vs
        }
        assert _delta_state(t) == want, f"divergence after batch {batch_id}"

    apply(0, [("a", 5.0, 1), ("a", 2.0, 1), ("b", 7.0, 1)])  # INSERTs
    apply(1, [("a", 5.0, -1), ("a", 9.0, 1)])  # MODIFY: 5.0 -> 9.0
    apply(2, [("b", 7.0, -1)])  # REMOVE empties b: its row must vanish
    assert "b" not in _delta_state(t)
    apply(3, [("b", 1.0, 1), ("a", 2.0, -1)])  # b returns; a shrinks


def test_delta_replay_is_exactly_once(spark, tmp_path):
    t = _mk_delta(spark, str(tmp_path / "mv"))
    d = _delta(spark, [("a", 5.0, 1)])
    assert t.apply_delta(d, 0) is True
    before = _delta_state(t)
    assert t.apply_delta(d, 0) is False
    assert _delta_state(t) == before


def test_bootstrap_then_delta(spark, tmp_path):
    """The initial-load complement: state seeded from a populated target's
    current rows, then maintained by deltas — matching the reference shape
    where COPY bulk-load precedes the stream merges
    (scripts/initial_load_from_export.sh + incremental_sync_*)."""
    t = _mk_delta(spark, str(tmp_path / "mv"))
    t.bootstrap(
        spark.createDataFrame(
            [("a", 5.0), ("a", 3.0), ("b", 1.0)], "member_id string, dollars double"
        )
    )
    assert t.last_applied() == -1
    assert _delta_state(t) == {"a": (2, 8.0), "b": (1, 1.0)}
    t.apply_delta(_delta(spark, [("a", 3.0, -1), ("b", 4.0, 1)]), 0)
    assert _delta_state(t) == {"a": (1, 5.0), "b": (2, 5.0)}


def test_delta_mode_rejects_non_invertible(spark, tmp_path):
    import pytest

    for kind in ("min", "max", "approx_distinct"):
        with pytest.raises(ValueError, match="invertible"):
            IncrementalAggTable(
                spark,
                str(tmp_path / f"mv_{kind}"),
                key_cols=["k"],
                key_types=[T.StringType()],
                aggs=[("n", "count", None), ("x", kind, "v")],
                out_types={"x": T.DoubleType()},
                retractable=True,
            )
    with pytest.raises(ValueError, match="first aggregate"):
        IncrementalAggTable(
            spark,
            str(tmp_path / "mv_nosupport"),
            key_cols=["k"],
            key_types=[T.StringType()],
            aggs=[("s", "sum", "v")],  # no count support column
            out_types={"s": T.DoubleType()},
            retractable=True,
        )
    t = _mk(spark, str(tmp_path / "mv_append"))  # append-only table
    with pytest.raises(ValueError, match="retractable"):
        t.apply_delta(_delta(spark, [("a", 1.0, 1)]), 0)


def test_cdc_delta_shape(spark, tmp_path):
    """cdc_delta: old images of staged keys at -1, new non-REMOVE images
    at +1 — a MODIFY contributes both, a REMOVE only the retraction, an
    INSERT of a fresh key only the +1."""
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.agg_maintenance import (
        cdc_delta,
    )

    target = spark.createDataFrame(
        [("k1", "a", 5.0), ("k2", "b", 7.0), ("k3", "b", 2.0)],
        "mq_id string, member_id string, dollars double",
    )
    staged = spark.createDataFrame(
        [("k1", "a", 9.0, "MODIFY"), ("k2", None, None, "REMOVE"),
         ("k9", "c", 4.0, "INSERT")],
        "mq_id string, member_id string, dollars double, eventName string",
    )
    got = {
        (r["mq_id"], r["_weight"]): (r["member_id"], r["dollars"])
        for r in cdc_delta(
            target, staged, "mq_id", ["mq_id", "member_id", "dollars"]
        ).collect()
    }
    assert got == {
        ("k1", -1): ("a", 5.0),   # old image of the MODIFY
        ("k1", 1): ("a", 9.0),    # new image of the MODIFY
        ("k2", -1): ("b", 7.0),   # REMOVE retracts only
        ("k9", 1): ("c", 4.0),    # fresh INSERT adds only
        # k3 untouched: no delta rows
    }


def test_maintained_histogram_percentiles_under_retraction(spark, tmp_path):
    """Maintained QUANTILES under CDC, by composition: a bucketed
    histogram is just a retractable count table keyed by
    (group, bucket) — counts subtract exactly, so MODIFY nets and
    REMOVE retracts keep the histogram bit-exact, and any percentile
    reads off the bucket CDF. No sketch with a difference operator is
    needed; resolution is the bucket width (the knob a 100 TB deployment
    sizes to its value range)."""
    from pyspark.sql import functions as F

    t = IncrementalAggTable(
        spark,
        str(tmp_path / "hist"),
        key_cols=["g", "bucket"],
        key_types=[T.StringType(), T.LongType()],
        aggs=[("n", "count", None)],
        retractable=True,
    )

    def delta(rows):
        """rows: (g, value, weight) -> bucketed delta (width 10)."""
        return spark.createDataFrame(
            [(g, v // 10, w) for g, v, w in rows],
            "g string, bucket long, _weight long",
        )

    live: list[int] = []

    def apply(bid, rows):
        t.apply_delta(delta(rows), bid)
        for _, v, w in rows:
            (live.append(v) if w > 0 else live.remove(v))

    def median_bucket():
        """bucket containing the median, read from the maintained CDF."""
        hist = sorted(
            (r["bucket"], r["n"]) for r in t.read().filter("g = 'a'").collect()
        )
        total = sum(n for _, n in hist)
        acc = 0
        for b, n in hist:
            acc += n
            if acc * 2 >= total:
                return b
        return None

    apply(0, [("a", v, 1) for v in (5, 12, 18, 23, 37, 41, 55, 68, 74, 99)])
    assert median_bucket() == sorted(live)[(len(live) - 1) // 2] // 10

    # MODIFY three small values up into the 90s, REMOVE one mid value:
    # the median must shift with the retractions
    apply(1, [("a", 5, -1), ("a", 91, 1), ("a", 12, -1), ("a", 95, 1),
              ("a", 18, -1), ("a", 93, 1), ("a", 37, -1)])
    assert median_bucket() == sorted(live)[(len(live) - 1) // 2] // 10
    # histogram == from-scratch recount, bucket for bucket
    want = {}
    for v in live:
        want[v // 10] = want.get(v // 10, 0) + 1
    got = {
        r["bucket"]: r["n"] for r in t.read().filter("g = 'a'").collect()
    }
    assert got == want
