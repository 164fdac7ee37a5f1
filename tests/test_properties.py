"""Property-based checks (hypothesis) for the custom operators, against
plain-Python reference implementations, plus CDC merge replay idempotence.

Each example is tiny (Spark job per example), so max_examples is kept small;
the generators still explore duplicate keys, equal timestamps, empty sides,
and single-element groups — the edges a fixture file misses.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from example_cdk_dynamodb_stream_to_redshift_spark.operators.asof import asof_join
from example_cdk_dynamodb_stream_to_redshift_spark.operators.merge import (
    MEMBER_SPEC,
    incremental_merge,
)
from example_cdk_dynamodb_stream_to_redshift_spark.operators.sessions import sessionize
from example_cdk_dynamodb_stream_to_redshift_spark.plans.extract import build_extract
from example_cdk_dynamodb_stream_to_redshift_spark.schemas import MEMBER_SCHEMA
from example_cdk_dynamodb_stream_to_redshift_spark.sources.cdc_envelope import (
    read_cdc_records,
)

from .cdc_fixtures import envelope, kinesis_record, write_jsonl

_T0 = dt.datetime(2024, 1, 1)


def _ts(sec: int) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=sec)


_few = st.integers(min_value=0, max_value=3)
_sec = st.integers(min_value=0, max_value=50)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.tuples(_few, _sec), max_size=8),
    right=st.lists(st.tuples(_few, _sec, st.integers(0, 99)), max_size=8),
)
def test_asof_join_matches_python_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(left)],
        "k int, t timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(s), rid) for (k, s, rid) in right], "k int, t timestamp, rid int"
    )
    out = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, on="k", left_time="t", right_time="t",
            value_cols=["rid"], right_tiebreak="rid",
        ).collect()
    }
    for i, (k, s) in enumerate(left):
        # reference: among right rows with same k and t <= left t, pick
        # latest t, break ties by max rid
        cands = [(rs, rid) for (rk, rs, rid) in right if rk == k and rs <= s]
        expect = max(cands)[1] if cands else None
        assert out[i] == expect, (i, k, s, cands)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=st.lists(st.tuples(_few, _sec), min_size=1, max_size=12, unique=True))
def test_sessionize_matches_python_reference(spark, events):
    gap = 10  # seconds
    df = spark.createDataFrame(
        [(k, _ts(s)) for (k, s) in events], "user_id int, ts timestamp"
    )
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, "user_id", "ts", gap="10 seconds").collect()
    )
    # reference: per key, sort times, break when diff > gap (strict)
    expect = []
    by_key: dict[int, list[int]] = {}
    for k, s in events:
        by_key.setdefault(k, []).append(s)
    for k, times in by_key.items():
        times.sort()
        cur = [times[0]]
        for t in times[1:]:
            if t - cur[-1] > gap:
                expect.append((k, _ts(cur[0]), _ts(cur[-1]), len(cur)))
                cur = [t]
            else:
                cur.append(t)
        expect.append((k, _ts(cur[0]), _ts(cur[-1]), len(cur)))
    assert got == sorted(expect)


def test_merge_replay_is_idempotent(spark, tmp_path):
    """ST6: re-applying an already-merged batch changes nothing — the
    watermark lives in the target, so replays are no-ops."""
    target = spark.createDataFrame(
        [("m1", "Alice", dt.datetime(2023, 1, 1), "INITIAL_LOAD", dt.datetime(2023, 1, 1))],
        MEMBER_SCHEMA,
    )
    img = {"pk": {"S": "M_m2"}, "sk": {"S": "Bob"}, "memberId": {"S": "m2"},
           "memberName": {"S": "Bob"}}
    path = write_jsonl(
        str(tmp_path / "b.json"),
        [kinesis_record(1, envelope("e1", "INSERT", "M_m2", "Bob", 1700000000000, img))],
    )
    extract = build_extract(read_cdc_records(spark, path))
    sync = dt.datetime(2023, 12, 1)

    once = incremental_merge(target, extract, MEMBER_SPEC, sync_ts=sync)
    twice = incremental_merge(once, extract, MEMBER_SPEC, sync_ts=sync)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == 2


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.data(),
    n=st.integers(min_value=1, max_value=24),
    nq=st.integers(min_value=1, max_value=4),
    k=st.integers(min_value=1, max_value=6),
)
def test_knn_join_matches_python_reference(spark, data, n, nq, k):
    """knn_join == plain-Python cosine ranking for every query, under
    random corpus sizes (incl. k > corpus), query counts, and ties
    (small integer-valued vectors collide in cosine deliberately)."""
    import math

    from pyspark.sql import functions as F

    from example_cdk_dynamodb_stream_to_redshift_spark.operators.similarity import (
        knn_join,
    )

    dim = 4
    vecs = [
        [
            float(data.draw(st.integers(min_value=-2, max_value=2), label="c"))
            for _ in range(dim)
        ]
        for _ in range(n)
    ]
    # cosine needs nonzero vectors
    vecs = [v if any(x != 0.0 for x in v) else [1.0, 0.0, 0.0, 0.0] for v in vecs]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).repartition(5)
    q_ids = list(range(min(nq, n)))
    queries = emb.filter(F.col("vec_id") < len(q_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q")
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    got = {
        (r["q_id"], r["vec_id"])
        for r in knn_join(emb, queries, k=k).collect()
    }
    want = set()
    for qid in q_ids:
        ranked = sorted(
            range(n), key=lambda i: (-cos(vecs[i], vecs[qid]), i)
        )[:k]
        want |= {(qid, i) for i in ranked}
    # ties at the k boundary may legitimately differ in float vs numpy
    # only if values differ — both use float64, same products, so exact
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=9),
        min_size=1,
        max_size=6,
    )
)
def test_span_dedup_matches_python_reference(spark, texts):
    """span_dedup == a plain-Python first-occurrence pass over (doc_id,
    span_idx) order, with random tiny vocabularies forcing heavy span
    collisions within and across docs (span_words=2)."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.dedup import (
        span_dedup,
    )

    docs = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(df, span_words=2).collect()}

    seen: set[str] = set()
    for i, text in docs:
        toks = text.split(" ")
        spans = [" ".join(toks[j : j + 2]) for j in range(0, len(toks), 2)]
        kept = []
        for sp in spans:
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        r = out[i]
        assert r["n_spans"] == len(spans), (i, spans)
        assert r["n_spans_kept"] == len(kept)
        assert r["clean_text"] == " ".join(kept)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data(), n_batches=st.integers(min_value=1, max_value=4))
def test_delta_ivm_matches_recompute_on_random_cdc_history(
    spark, tmp_path_factory, data, n_batches
):
    """Retractable IncrementalAggTable vs from-scratch GROUP BY over the
    live multiset, across RANDOM insert/modify/remove histories: random
    keys (collisions deliberate), random quarter-valued amounts (exact
    in binary — the value class the CDC fixtures use), random batch
    boundaries. Covers group emptying-and-returning, modify-to-same-
    value, and remove-before-insert orderings a fixed fixture misses."""
    from pyspark.sql import types as T

    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.agg_maintenance import (
        IncrementalAggTable,
    )

    t = IncrementalAggTable(
        spark,
        str(tmp_path_factory.mktemp("ivm_prop")),
        key_cols=["g"],
        key_types=[T.StringType()],
        aggs=[("n", "count", None), ("s", "sum", "v")],
        out_types={"s": T.DoubleType()},
        retractable=True,
    )
    live: dict[str, list[float]] = {}
    for bid in range(n_batches):
        ops = []
        n_ops = data.draw(st.integers(min_value=0, max_value=6), label="n_ops")
        for _ in range(n_ops):
            g = data.draw(st.sampled_from(["a", "b", "c"]), label="g")
            vals = live.get(g, [])
            can_remove = bool(vals)
            op = data.draw(
                st.sampled_from(
                    ["insert", "modify", "remove"] if can_remove else ["insert"]
                ),
                label="op",
            )
            if op == "insert":
                v = data.draw(st.integers(min_value=0, max_value=40), label="v") * 0.25
                ops.append((g, v, 1))
                live.setdefault(g, []).append(v)
            elif op == "remove":
                old = data.draw(st.sampled_from(vals), label="old")
                ops.append((g, old, -1))
                vals.remove(old)
            else:  # modify = retract old + insert new (possibly equal)
                old = data.draw(st.sampled_from(vals), label="old2")
                new = data.draw(st.integers(min_value=0, max_value=40), label="nv") * 0.25
                ops.append((g, old, -1))
                ops.append((g, new, 1))
                vals.remove(old)
                vals.append(new)
        delta = spark.createDataFrame(
            ops or [("a", 0.0, 1), ("a", 0.0, -1)],  # empty batch -> net-zero pair
            "g string, v double, _weight long",
        )
        assert t.apply_delta(delta, bid) is True
        got = {r["g"]: (r["n"], r["s"]) for r in t.read().collect()}
        want = {
            g: (len(vs), sum(vs)) for g, vs in live.items() if vs
        }
        assert got == want, f"divergence after batch {bid}"


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # key: m<k>
            st.integers(min_value=1, max_value=20),   # event second offset
            st.sampled_from(["INSERT", "MODIFY", "REMOVE"]),
        ),
        min_size=1,
        max_size=10,
    ),
    cuts=st.lists(st.integers(min_value=1, max_value=9), max_size=2, unique=True),
)
def test_partitioned_merge_matches_reference_on_random_histories(
    spark, tmp_path_factory, events, cuts
):
    """Random CDC histories split at random batch boundaries: the
    bucketed store's merge (incl. the round-7 manifest commit path) must
    agree with BOTH the full-rewrite incremental_merge chain and a
    pure-Python CDC reference — same watermark gating (ts > in-table
    max), same latest-per-key (ts desc, numeric seqno desc), same
    REMOVE/upsert semantics."""
    import datetime as dtm

    from example_cdk_dynamodb_stream_to_redshift_spark.operators.partitioned_store import (
        PartitionedParquetTable,
    )

    base_ms = 1700000000000
    old = dtm.datetime(2023, 1, 1)
    sync = dtm.datetime(2023, 12, 1)
    tmp = tmp_path_factory.mktemp("randcdc")

    def ev_ts(sec):
        return dtm.datetime.fromtimestamp(
            base_ms // 1000 + sec, dtm.timezone.utc
        ).replace(tzinfo=None)

    # stream order = seq order; batches split at the given cut points
    recs = []
    for seq, (k, sec, name) in enumerate(events, start=1):
        uid, nm = f"m{k}", f"n{seq}"
        img = None if name == "REMOVE" else {
            "pk": {"S": f"M_{uid}"}, "sk": {"S": nm},
            "memberId": {"S": uid}, "memberName": {"S": nm}}
        recs.append(
            (seq, kinesis_record(seq, envelope(f"e{seq}", name, f"M_{uid}",
                                               nm, base_ms + sec * 1000, img)))
        )
    bounds = sorted({c for c in cuts if c < len(recs)}) + [len(recs)]
    batches, start = [], 0
    for b in bounds:
        if b > start:
            batches.append(recs[start:b])
            start = b

    seed_rows = [(f"m{i}", f"seed{i}", old, "INITIAL_LOAD", old) for i in (0, 1)]
    seed = spark.createDataFrame(seed_rows, MEMBER_SCHEMA)
    table = PartitionedParquetTable(
        spark, str(tmp / "member"), MEMBER_SCHEMA, "memberId", 4
    )
    table.overwrite_full(seed)
    full = seed

    # pure-Python reference: key -> (name, ts)
    ref = {f"m{i}": (f"seed{i}", old) for i in (0, 1)}
    for bi, batch in enumerate(batches):
        path = write_jsonl(str(tmp / f"b{bi}.json"), [r for _, r in batch])
        ext = build_extract(read_cdc_records(spark, path))
        table.merge(ext, MEMBER_SPEC, sync_ts=sync)
        full = incremental_merge(full, ext, MEMBER_SPEC, sync_ts=sync)
        full = spark.createDataFrame(full.collect(), full.schema)  # cut lineage

        wm = max((ts for _, ts in ref.values()), default=old)
        staged = {}
        for seq, _ in batch:
            k, sec, name = events[seq - 1]
            if ev_ts(sec) <= wm:
                continue
            uid = f"m{k}"
            cur = staged.get(uid)
            if cur is None or (ev_ts(sec), seq) > (cur[0], cur[1]):
                staged[uid] = (ev_ts(sec), seq, name, f"n{seq}")
        for uid, (ts, seq, name, nm) in staged.items():
            if name == "REMOVE":
                ref.pop(uid, None)
            else:
                ref[uid] = (nm, ts)

    got_part = sorted(
        (r["memberId"], r["memberName"], r["approximateUpdateTimestamp"])
        for r in table.read().collect()
    )
    got_full = sorted(
        (r["memberId"], r["memberName"], r["approximateUpdateTimestamp"])
        for r in full.collect()
    )
    want = sorted((k, nm, ts) for k, (nm, ts) in ref.items())
    assert got_part == want
    assert got_full == want
