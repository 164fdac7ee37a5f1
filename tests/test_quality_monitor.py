"""Streaming data-quality gate (streaming/quality_monitor.py): the
expectation suite applied per micro-batch — report/quarantine/clean
partition every batch, replay rewrites instead of double-counting,
abort mode records before stopping, and the live-stream drive matches
the batch ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.expectations import (
    in_range,
    not_null,
    split_violations,
    unique,
    validate,
)
from example_cdk_dynamodb_stream_to_redshift_spark.streaming.quality_monitor import (
    BatchContractError,
    QualityGate,
)

SCHEMA = "id bigint, v double, tag string"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _checks():
    return [not_null("tag"), in_range("v", 0.0, 100.0), unique("id")]


@pytest.fixture()
def gate(spark, tmp_path):
    return QualityGate(spark, _checks(), str(tmp_path / "gate"))


def test_batch_partitions_into_clean_and_quarantine(spark, gate):
    batch = _rows(
        spark,
        [
            (1, 5.0, "a"),
            (2, 500.0, "b"),      # range violation
            (3, 7.0, None),       # null violation
            (3, 8.0, "c"),        # duplicate id (table-level only)
        ],
    )
    got_clean = []
    stats = gate.process_batch(
        batch, 0, lambda df, bid: got_clean.extend(df.collect())
    )
    assert stats["n_rows"] == 4
    assert stats["n_quarantined"] == 2  # row-level only; the dup id stays
    assert stats["n_clean"] == 2
    assert set(stats["failed_checks"]) == {
        "in_range(v,0.0,100.0)",
        "not_null(tag)",
        "unique(id)",
    }
    assert sorted(r["id"] for r in got_clean) == [1, 3]
    q = gate.quarantine(empty_like=batch).collect()
    assert sorted(r["id"] for r in q) == [2, 3]
    blame = {r["id"]: list(r["failed_checks"]) for r in q}
    assert blame[2] == ["in_range(v,0.0,100.0)"]
    assert blame[3] == ["not_null(tag)"]
    # clean + quarantined partition the batch
    assert stats["n_clean"] + stats["n_quarantined"] == stats["n_rows"]


def test_report_matches_batch_validate_exactly(spark, gate):
    batch = _rows(spark, [(i, float(i * 30), "t" if i % 2 else None) for i in range(6)])
    gate.process_batch(batch, 7)
    want = sorted(
        tuple(r) for r in validate(batch, _checks()).collect()
    )
    got = sorted(
        tuple(r)
        for r in gate.report()
        .filter(F.col("batch_id") == 7)
        .select("check", "n_rows", "violations", "passed")
        .collect()
    )
    assert got == want


def test_replay_overwrites_not_doubles(spark, gate):
    batch = _rows(spark, [(1, 5.0, "a"), (2, 500.0, "b")])
    gate.process_batch(batch, 3)
    before_report = sorted(tuple(r) for r in gate.report().collect())
    before_q = sorted(tuple(r) for r in gate.quarantine(empty_like=batch).collect())
    gate.process_batch(batch, 3)  # at-least-once replay of the SAME batch
    assert sorted(tuple(r) for r in gate.report().collect()) == before_report
    assert (
        sorted(tuple(r) for r in gate.quarantine(empty_like=batch).collect())
        == before_q
    )


def test_abort_mode_records_then_raises(spark, tmp_path):
    gate = QualityGate(
        spark, _checks(), str(tmp_path / "abort_gate"), mode="abort"
    )
    batch = _rows(spark, [(1, 5.0, "a"), (2, 500.0, "b")])
    sunk = []
    with pytest.raises(BatchContractError, match="batch 5 violates"):
        gate.process_batch(batch, 5, lambda df, bid: sunk.extend(df.collect()))
    # nothing was published to the sink, but the FAILURE is observable:
    # the report and quarantine rows for the offending batch exist
    assert not sunk
    rep = gate.report().filter(F.col("batch_id") == 5).collect()
    assert any(not r["passed"] for r in rep)
    assert len(gate.quarantine(empty_like=batch).collect()) == 1
    # a conforming batch then passes through the same gate
    ok = _rows(spark, [(9, 5.0, "z")])
    stats = gate.process_batch(ok, 6, lambda df, bid: sunk.extend(df.collect()))
    assert stats["failed_checks"] == [] and len(sunk) == 1


def test_empty_batch_reports_all_green(spark, gate):
    stats = gate.process_batch(_rows(spark, []), 0)
    assert (
        stats["n_rows"],
        stats["n_clean"],
        stats["n_quarantined"],
        stats["failed_checks"],
    ) == (0, 0, 0, [])
    assert stats["clean"].count() == 0
    rep = gate.report().collect()
    assert len(rep) == 3 and all(r["passed"] for r in rep)


def test_empty_check_suite_passes_everything_through(spark, tmp_path):
    """A dynamically-built suite can be empty; the gate must pass the
    batch through rather than crash in validate()'s explode-of-zero-
    structs (r8 review finding). Same contract for the batch operators
    directly."""
    gate = QualityGate(spark, [], str(tmp_path / "empty_gate"))
    batch = _rows(spark, [(1, 5.0, "a"), (2, 500.0, None)])
    stats = gate.process_batch(batch, 0)
    assert stats["n_rows"] == 2 and stats["n_quarantined"] == 0
    assert sorted(r["id"] for r in stats["clean"].collect()) == [1, 2]
    assert gate.report().count() == 0
    clean, flagged = split_violations(batch, [])
    assert clean.count() == 2 and flagged.count() == 0
    assert "failed_checks" in flagged.columns
    assert validate(batch, []).count() == 0


def test_report_batch_id_is_partition_column_only(spark, gate):
    """batch_id comes from directory discovery (int, like every other
    batch_id= store) and is not duplicated as a written data column —
    duplication made Spark drop the written column with a warning and
    flip the dtype between empty and non-empty reads (r8 review
    finding)."""
    gate.process_batch(_rows(spark, [(1, 5.0, "a")]), 4)
    rep = gate.report()
    assert dict(rep.dtypes)["batch_id"] == "int"
    assert {r["batch_id"] for r in rep.collect()} == {4}
    import glob
    import os

    part = glob.glob(os.path.join(gate.report_dir, "batch_id=4", "*.parquet"))
    assert part, "report batch dir must exist"
    on_disk = spark.read.parquet(part[0])
    assert "batch_id" not in on_disk.columns


def test_bad_mode_is_loud(spark, tmp_path):
    with pytest.raises(ValueError, match="mode must be"):
        QualityGate(spark, _checks(), str(tmp_path / "g"), mode="drop")


def test_live_stream_equals_batch_ground_truth(spark, tmp_path):
    """Drive a real readStream -> foreachBatch(gate.wrap(sink)) over
    multiple micro-batches: the union of sink-received clean rows and
    quarantined rows must equal the input, the per-batch report must
    say one row per (batch, check), and compaction must not change
    either artifact."""
    src = str(tmp_path / "src")
    rows = [(i, 500.0 if i % 5 == 0 else float(i % 90), "t" if i % 7 else None)
            for i in range(60)]
    _rows(spark, rows).repartition(4).write.parquet(src)

    gate = QualityGate(spark, _checks(), str(tmp_path / "stream_gate"))
    landed = str(tmp_path / "landed")
    sink = lambda df, bid: df.write.mode("overwrite").parquet(  # noqa: E731
        f"{landed}/batch_id={bid}"
    )
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(gate.wrap(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(landed).drop("batch_id")
    quarantined = gate.quarantine(
        empty_like=_rows(spark, [])
    ).drop("failed_checks", "batch_id")
    got = sorted(tuple(r) for r in clean.unionByName(quarantined).collect())
    assert got == sorted(rows)

    rep = gate.report().collect()
    n_batches = len({r["batch_id"] for r in rep})
    assert n_batches >= 2, "fixture must span multiple micro-batches"
    assert len(rep) == n_batches * len(_checks())
    # totals line up with the batch-level suite over the whole input
    whole = {r["check"]: r["violations"]
             for r in validate(_rows(spark, rows), _checks()).collect()}
    per_batch = {}
    for r in rep:
        per_batch[r["check"]] = per_batch.get(r["check"], 0) + r["violations"]
    # row-level checks sum across batches; uniqueness is per-batch scoped
    # (cross-batch dedup is the CDC merge's job) — equal here because the
    # fixture has no cross-batch duplicate ids
    assert per_batch == whole

    before_rep = sorted(tuple(r) for r in gate.report().collect())
    gate.compact(keep_last=1)
    assert sorted(tuple(r) for r in gate.report().collect()) == before_rep


def test_cdc_pipeline_contract_gate_e2e(spark, tmp_path):
    """CdcPipeline(extract_checks=...): rows that PARSE as change events
    but violate the declared extract contract (unknown eventName, pk
    outside the entity prefixes) are diverted to the contract quarantine
    with their failed checks — they never reach the extract table, the
    targets, or the sync accounting — while conforming rows merge
    normally. The dead-letter quarantine (unparseable payloads) and the
    contract quarantine (parsed-but-nonconforming) stay distinct."""
    import datetime as dt
    import json

    from example_cdk_dynamodb_stream_to_redshift_spark.operators.expectations import (
        accepted_values,
        matches,
        not_null,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming import CdcPipeline

    from .cdc_fixtures import (
        envelope,
        kinesis_record,
        member_item,
        member_quest_item,
        quest_item,
        write_jsonl,
    )

    BASE_MS = 1700000000000
    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(
        str(export_dir / "part0.json"),
        [
            member_item("m1", "Alice"),
            member_item("m2", "Bob"),
            quest_item("q1", "Walk"),
            member_quest_item("mq1", "m1", "q1", "10.00"),
        ],
    )

    def member_env(seq, eid, name_ev, uuid, name, ms, pk=None):
        img = {
            "pk": {"S": pk or f"M_{uuid}"},
            "sk": {"S": name},
            "memberId": {"S": uuid},
            "memberName": {"S": name},
        }
        return kinesis_record(
            seq, envelope(eid, name_ev, pk or f"M_{uuid}", name, ms, img)
        )

    write_jsonl(
        str(stream_dir / "b1.json"),
        [
            member_env(1, "e1", "INSERT", "m3", "Carol", BASE_MS + 1000),
            # parses fine; violates accepted_values(eventName)
            member_env(2, "e2", "UPSERT", "m4", "Mallory", BASE_MS + 2000),
            # parses fine; violates matches(pk): unknown entity prefix
            member_env(3, "e3", "INSERT", "m5", "Eve", BASE_MS + 3000, pk="X_m5"),
            # not an envelope at all -> the DEAD-LETTER quarantine
            {
                "approximate_arrival_timestamp": "2023-11-15T00:00:00.000Z",
                "partition_key": "junk",
                "shard_id": "s0",
                "sequence_number": "0004",
                "kinesis_data": json.dumps({"not": "an envelope"}),
            },
        ],
    )

    checks = [
        accepted_values("eventName", ["INSERT", "MODIFY", "REMOVE"]),
        matches("pk", "^(M_|Q_|MQ#)"),
        not_null("sequencenumber"),
    ]
    pipe = CdcPipeline(
        spark, str(stream_dir), str(tmp_path / "wh"), extract_checks=checks
    )
    pipe.initial_load(str(export_dir), sync_ts=dt.datetime(2023, 1, 1))
    pipe.refresh()

    # conforming row merged; violating rows did NOT become members
    members = {r.memberId for r in pipe.table("member").collect()}
    assert members == {"m1", "m2", "m3"}

    # contract quarantine holds exactly the two violators, with blame
    cq = pipe.contract_quarantine().collect()
    blame = {r["eventID"]: list(r["failed_checks"]) for r in cq}
    assert blame == {
        "e2": ["accepted_values(eventName)"],
        "e3": ["matches(pk)"],
    }
    # extract table holds only contract-clean rows
    assert {r["eventID"] for r in pipe.extract_table().collect()} == {"e1"}

    # report: one row per check for the batch; the two failing checks red
    rep = {r["check"]: r for r in pipe.contract_report().collect()}
    assert len(rep) == 3
    assert rep["accepted_values(eventName)"]["violations"] == 1
    assert rep["matches(pk)"]["violations"] == 1
    assert rep["not_null(sequencenumber)"]["passed"]
    # the gate saw only PARSED rows (3), not the dead-letter payload
    assert rep["matches(pk)"]["n_rows"] == 3

    # the unparseable payload went to the DEAD-LETTER quarantine, not the
    # contract one
    assert pipe.quarantine_table().count() == 1

    # a second, fully-conforming refresh passes through untouched
    write_jsonl(
        str(stream_dir / "b2.json"),
        [member_env(5, "e5", "INSERT", "m6", "Frank", BASE_MS + 5000)],
    )
    pipe.refresh()
    assert {r.memberId for r in pipe.table("member").collect()} == {
        "m1", "m2", "m3", "m6",
    }
    assert len(pipe.contract_report().collect()) == 6  # 2 batches x 3 checks
    # accessors refuse when the gate was never configured
    bare = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh2"))
    with pytest.raises(ValueError, match="without extract_checks"):
        bare.contract_report()


def test_cdc_pipeline_composed_gate_and_drift_monitor(spark, tmp_path):
    """The full composed observability pipeline as a first-class
    CdcPipeline option (extract_checks + extract_profile_specs — the
    gate.wrap(monitor.wrap(sink)) ordering): contracts gate each batch,
    then the CONTRACT-CLEAN rows are histogram-profiled into the
    per-batch drift store, then the extract publishes. Violators are
    excluded from the profiles; trend() localizes which micro-batch
    shifted; the per-batch stage clock records the profile cost."""
    import datetime as dt

    from example_cdk_dynamodb_stream_to_redshift_spark.operators.drift import (
        CategoricalProfile,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.expectations import (
        accepted_values,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming import CdcPipeline

    from .cdc_fixtures import (
        envelope,
        kinesis_record,
        member_item,
        member_quest_item,
        quest_item,
        write_jsonl,
    )

    BASE_MS = 1700000000000
    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(
        str(export_dir / "part0.json"),
        [
            member_item("m1", "Alice"),
            quest_item("q1", "Walk"),
            member_quest_item("mq1", "m1", "q1", "10.00"),
        ],
    )

    def member_env(seq, eid, name_ev, uuid, name, ms):
        img = {
            "pk": {"S": f"M_{uuid}"},
            "sk": {"S": name},
            "memberId": {"S": uuid},
            "memberName": {"S": name},
        }
        return kinesis_record(
            seq, envelope(eid, name_ev, f"M_{uuid}", name, ms, img)
        )

    # batch 0: 3 INSERTs + 1 contract violator (UPSERT — gated out)
    write_jsonl(
        str(stream_dir / "b0.json"),
        [member_env(i, f"e{i}", "INSERT", f"m{i+2}", f"n{i}", BASE_MS + i * 1000)
         for i in range(1, 4)]
        + [member_env(4, "e4", "UPSERT", "m9", "bad", BASE_MS + 4000)],
    )
    specs = [CategoricalProfile("eventName", ("INSERT", "MODIFY", "REMOVE"))]
    pipe = CdcPipeline(
        spark,
        str(stream_dir),
        str(tmp_path / "wh"),
        extract_checks=[accepted_values("eventName", ["INSERT", "MODIFY", "REMOVE"])],
        extract_profile_specs=specs,
    )
    pipe.initial_load(str(export_dir), sync_ts=dt.datetime(2023, 1, 1))
    pipe.refresh()
    assert "drift_profile_sec" in pipe.last_batch_stages

    prof0 = {
        (r["bucket"]): r["cnt"]
        for r in pipe.drift_profiles().filter("batch_id = 0").collect()
    }
    # the UPSERT violator was gated out BEFORE profiling: 3 clean rows,
    # none in __other__ (where UPSERT would land)
    assert prof0["INSERT"] == 3
    assert prof0["__other__"] == 0
    assert sum(prof0.values()) == 3

    # batch 1: distribution shift — all REMOVEs
    write_jsonl(
        str(stream_dir / "b1.json"),
        [member_env(10 + i, f"r{i}", "REMOVE", f"m{i+2}", f"n{i}",
                    BASE_MS + (10 + i) * 1000) for i in range(3)],
    )
    pipe.refresh()
    baseline = pipe.drift_profiles().filter("batch_id = 0").select(
        "column", "bucket", "cnt"
    )
    trend = {
        r["batch_id"]: r for r in pipe.drift_trend(baseline).collect()
    }
    assert not trend[0]["drifted"]  # batch 0 vs itself
    assert trend[1]["drifted"]      # the all-REMOVE batch

    # accessors refuse when the monitor was never configured
    bare = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh3"))
    with pytest.raises(ValueError, match="without extract_profile_specs"):
        bare.drift_profiles()


def test_gated_refresh_job_overhead_budget(spark, tmp_path):
    """The composed observability pipeline's per-refresh Spark-job
    overhead is FENCED (the budget entry for the cdc_refresh_gated
    bench metric): gate (validate agg + report write + clean-batch
    quarantine skip probe) plus drift profile (one agg collect + one
    local-relation store write) must stay a bounded handful of extra
    jobs per micro-batch — if a change makes either rescan or shuffle
    the batch, this count jumps and the fence fails mechanically."""
    import datetime as dt

    from example_cdk_dynamodb_stream_to_redshift_spark.operators.drift import (
        CategoricalProfile,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.expectations import (
        accepted_values,
        not_null,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming import CdcPipeline

    from .cdc_fixtures import (
        envelope,
        kinesis_record,
        member_item,
        member_quest_item,
        quest_item,
        write_jsonl,
    )

    BASE_MS = 1700000000000
    export_dir = tmp_path / "export"
    write_jsonl(
        str(export_dir / "part0.json"),
        [
            member_item("m1", "Alice"),
            quest_item("q1", "Walk"),
            member_quest_item("mq1", "m1", "q1", "10.00"),
        ],
    )

    def stream_of(d):
        d.mkdir()
        rows = []
        for i in range(50):
            img = {
                "pk": {"S": f"M_u{i}"},
                "sk": {"S": f"n{i}"},
                "memberId": {"S": f"u{i}"},
                "memberName": {"S": f"n{i}"},
            }
            rows.append(
                kinesis_record(
                    i,
                    envelope(f"e{i}", "INSERT", f"M_u{i}", f"n{i}",
                             BASE_MS + i * 1000, img),
                )
            )
        write_jsonl(str(d / "b0.json"), rows)
        return str(d)

    next_job_id = (
        lambda: spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    )  # noqa: E731

    obs_kwargs = {
        "extract_checks": [
            accepted_values("eventName", ["INSERT", "MODIFY", "REMOVE"]),
            not_null("sequencenumber"),
        ],
        "extract_profile_specs": [
            CategoricalProfile("eventName", ("INSERT", "MODIFY", "REMOVE"))
        ],
    }
    jobs = {}
    for tag, kwargs in (("bare", {}), ("gated", obs_kwargs)):
        pipe = CdcPipeline(
            spark,
            stream_of(tmp_path / f"stream_{tag}"),
            str(tmp_path / f"wh_{tag}"),
            **kwargs,
        )
        pipe.initial_load(str(export_dir), sync_ts=dt.datetime(2023, 1, 1))
        j0 = next_job_id()
        pipe.refresh()
        jobs[tag] = next_job_id() - j0

    delta = jobs["gated"] - jobs["bare"]
    # measured: 4 extra jobs per all-clean micro-batch (gate validate
    # toArrow + quarantine skip probe; profile agg toArrow + split
    # headroom) — the report/profile STORE writes are driver-side
    # pyarrow since r13, so they cost zero Spark jobs (was 6 when each
    # paid a local-relation write job); +2 AQE/stage-split headroom
    assert 0 < delta <= 6, jobs
