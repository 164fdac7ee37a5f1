"""CDC semantics tests (ST1-ST8, FIXTURES.md §5 scenarios) — batch merge
unit tests plus the full streaming E2E mirroring scripts/test_sync_time.sh."""

from __future__ import annotations

import datetime as dt

import pytest

from example_cdk_dynamodb_stream_to_redshift_spark.operators.merge import (
    MEMBER_QUEST_SPEC,
    MEMBER_SPEC,
    incremental_merge,
)
from example_cdk_dynamodb_stream_to_redshift_spark.plans.extract import build_extract
from example_cdk_dynamodb_stream_to_redshift_spark.plans.queries import (
    recent_syncs,
    rewards_by_member,
    rewards_by_quest,
)
from example_cdk_dynamodb_stream_to_redshift_spark.schemas import MEMBER_SCHEMA
from example_cdk_dynamodb_stream_to_redshift_spark.sources.cdc_envelope import (
    read_cdc_records,
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

BASE_MS = 1700000000000  # 2023-11-14T22:13:20Z
OLD = dt.datetime(2023, 1, 1)


def member_env(seq, eid, name_ev, uuid, name, ms):
    img = None
    if name_ev != "REMOVE":
        img = {
            "pk": {"S": f"M_{uuid}"},
            "sk": {"S": name},
            "memberId": {"S": uuid},
            "memberName": {"S": name},
        }
    return kinesis_record(seq, envelope(eid, name_ev, f"M_{uuid}", name, ms, img))


def mq_env(seq, eid, name_ev, uuid, member_uuid, quest_uuid, dollars, ms):
    img = None
    if name_ev != "REMOVE":
        img = {
            "pk": {"S": f"MQ#M_{member_uuid}"},
            "sk": {"S": f"MQ_{uuid}"},
            "questId": {"S": quest_uuid},
            "dollarsEarned": {"N": dollars},
        }
    return kinesis_record(
        seq, envelope(eid, name_ev, f"MQ#M_{member_uuid}", f"MQ_{uuid}", ms, img)
    )


@pytest.fixture()
def seeded_member(spark):
    """Member target seeded as if initial-loaded at OLD."""
    return spark.createDataFrame(
        [("m1", "Alice", OLD, "INITIAL_LOAD", OLD), ("m2", "Bob", OLD, "INITIAL_LOAD", OLD)],
        MEMBER_SCHEMA,
    )


def extract_of(spark, tmp_path, records, name="batch"):
    path = write_jsonl(str(tmp_path / f"{name}.json"), records)
    return build_extract(read_cdc_records(spark, path))


# ---- scenario 1: INSERT then MODIFY same key in one batch -> latest only ----
def test_same_batch_latest_wins(spark, tmp_path, seeded_member):
    ext = extract_of(
        spark,
        tmp_path,
        [
            member_env(1, "e1", "INSERT", "m3", "Carol", BASE_MS + 1000),
            member_env(2, "e2", "MODIFY", "m3", "Caroline", BASE_MS + 2000),
        ],
    )
    out = incremental_merge(seeded_member, ext, MEMBER_SPEC, sync_ts=dt.datetime(2023, 12, 1))
    rows = {r.memberId: r for r in out.collect()}
    assert rows["m3"].memberName == "Caroline"
    assert rows["m3"].eventName == "MODIFY"
    assert len(rows) == 3


# ---- scenario 2: MODIFY of existing key -> replaced, new syncTimestamp ----
def test_modify_replaces(spark, tmp_path, seeded_member):
    sync = dt.datetime(2023, 12, 1)
    ext = extract_of(
        spark, tmp_path, [member_env(1, "e1", "MODIFY", "m1", "Alicia", BASE_MS)]
    )
    out = incremental_merge(seeded_member, ext, MEMBER_SPEC, sync_ts=sync)
    rows = {r.memberId: r for r in out.collect()}
    assert rows["m1"].memberName == "Alicia"
    assert rows["m1"].syncTimestamp == sync
    assert rows["m2"].memberName == "Bob"  # untouched


# ---- scenario 3: REMOVE -> deleted, not re-inserted ----
def test_remove_deletes(spark, tmp_path, seeded_member):
    ext = extract_of(
        spark, tmp_path, [member_env(1, "e1", "REMOVE", "m2", "Bob", BASE_MS)]
    )
    out = incremental_merge(seeded_member, ext, MEMBER_SPEC, sync_ts=dt.datetime(2023, 12, 1))
    assert {r.memberId for r in out.collect()} == {"m1"}


# ---- scenario 4: event at/below watermark silently dropped (ST6) ----
def test_late_event_dropped(spark, tmp_path, seeded_member):
    late_ms = int(dt.datetime(2022, 6, 1).timestamp() * 1000)  # before OLD
    ext = extract_of(
        spark, tmp_path, [member_env(1, "e1", "MODIFY", "m1", "STALE", late_ms)]
    )
    out = incremental_merge(seeded_member, ext, MEMBER_SPEC, sync_ts=dt.datetime(2023, 12, 1))
    rows = {r.memberId: r for r in out.collect()}
    assert rows["m1"].memberName == "Alice"


# ---- scenario 5: merge against empty target raises (ST8) ----
def test_empty_target_guard(spark, tmp_path):
    empty = spark.createDataFrame([], MEMBER_SCHEMA)
    ext = extract_of(
        spark, tmp_path, [member_env(1, "e1", "INSERT", "m1", "A", BASE_MS)]
    )
    with pytest.raises(ValueError, match="initial load"):
        incremental_merge(empty, ext, MEMBER_SPEC)


# ---- tie on event time (second precision) -> deterministic by seq ----
def test_second_precision_tie_breaks_by_sequence(spark, tmp_path, seeded_member):
    # 400ms apart: both floor to the same second (F10 integer division)
    ext = extract_of(
        spark,
        tmp_path,
        [
            member_env(1, "e1", "MODIFY", "m1", "First", BASE_MS + 100),
            member_env(2, "e2", "MODIFY", "m1", "Second", BASE_MS + 500),
        ],
    )
    out = incremental_merge(seeded_member, ext, MEMBER_SPEC, sync_ts=dt.datetime(2023, 12, 1))
    rows = {r.memberId: r for r in out.collect()}
    assert rows["m1"].memberName == "Second"  # higher sequence number wins


# ---- member_quest projection: NewImage navigation + N-string cast ----
def test_member_quest_projection(spark, tmp_path):
    from example_cdk_dynamodb_stream_to_redshift_spark.schemas import MEMBER_QUEST_SCHEMA

    target = spark.createDataFrame(
        [("mq0", "m1", "q1", 5.0, OLD, "INITIAL_LOAD", OLD)], MEMBER_QUEST_SCHEMA
    )
    ext = extract_of(
        spark, tmp_path, [mq_env(1, "e1", "INSERT", "mq9", "m1", "q1", "42.17", BASE_MS)]
    )
    out = incremental_merge(target, ext, MEMBER_QUEST_SPEC, sync_ts=dt.datetime(2023, 12, 1))
    rows = {r.memberQuestId: r for r in out.collect()}
    assert rows["mq9"].dollarsEarned == 42.17
    assert rows["mq9"].memberId == "m1"
    assert rows["mq9"].questId == "q1"


# ---- full streaming E2E (scripts/test_sync_time.sh parity) ----
def test_streaming_pipeline_e2e(spark, tmp_path):
    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(
        str(export_dir / "part0.json"),
        [
            member_item("m1", "Alice"),
            member_item("m2", "Bob"),
            quest_item("q1", "Walk 10,000 steps"),
            member_quest_item("mq1", "m1", "q1", "10.00"),
        ],
    )
    pipe = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh"))
    pipe.initial_load(str(export_dir), sync_ts=OLD)

    write_jsonl(
        str(stream_dir / "b1.json"),
        [
            member_env(1, "e1", "INSERT", "m3", "Carol", BASE_MS + 1000),
            member_env(2, "e2", "MODIFY", "m3", "Caroline", BASE_MS + 2000),
            member_env(3, "e3", "REMOVE", "m2", "Bob", BASE_MS + 3000),
            mq_env(4, "e4", "INSERT", "mq2", "m3", "q1", "25.50", BASE_MS + 4000),
        ],
    )
    pipe.refresh()

    members = {r.memberId: r for r in pipe.table("member").collect()}
    assert set(members) == {"m1", "m3"}
    assert members["m3"].memberName == "Caroline"
    assert pipe.table("member").filter("syncTimestamp IS NULL").count() == 0

    # incremental second batch: stale event dropped, fresh one applied
    write_jsonl(
        str(stream_dir / "b2.json"),
        [
            member_env(5, "e5", "MODIFY", "m3", "STALE", BASE_MS + 1500),
            member_env(6, "e6", "MODIFY", "m1", "Alicia", BASE_MS + 9000),
        ],
    )
    pipe.refresh()
    members = {r.memberId: r.memberName for r in pipe.table("member").collect()}
    assert members == {"m1": "Alicia", "m3": "Caroline"}

    # the four reference reports run on the targets
    mq, m, q = pipe.table("member_quest"), pipe.table("member"), pipe.table("quest")
    rewards = {r.memberId: r.totalDollarsEarned for r in rewards_by_member(mq, m).collect()}
    assert rewards == {"m1": 10.0, "m3": 25.5}
    by_quest = {r.questId: r.totalDollarsEarned for r in rewards_by_quest(mq, q).collect()}
    assert by_quest == {"q1": 35.5}
    assert recent_syncs(m).count() == 2

    # extract table (MV) accumulated all 6 records
    assert pipe.extract_table().count() == 6


# ---- dead-letter quarantine: corrupt payloads are visible, not silent ----
def test_quarantine_collects_corrupt_payloads(spark, tmp_path):
    import json as _json

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
    pipe = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh"))
    pipe.initial_load(str(export_dir), sync_ts=OLD)

    good = member_env(1, "e1", "INSERT", "m3", "Carol", BASE_MS + 1000)
    junk = dict(good)
    junk["sequence_number"] = "9".zfill(20)
    junk["kinesis_data"] = "{not json at all"          # unparseable payload
    alien = dict(good)
    alien["sequence_number"] = "8".zfill(20)
    alien["kinesis_data"] = _json.dumps({"foo": "bar"})  # JSON, not an envelope
    write_jsonl(str(stream_dir / "b1.json"), [good, junk, alien])
    pipe.refresh()

    # good row merged; corrupt rows neither merged nor lost
    members = {r.memberId for r in pipe.table("member").collect()}
    assert "m3" in members
    quarantined = pipe.quarantine_table().collect()
    assert len(quarantined) == 2
    payloads = {r.kinesis_data for r in quarantined}
    assert payloads == {"{not json at all", _json.dumps({"foo": "bar"})}
    assert all(r.batch_id == 0 for r in quarantined)

    # a clean follow-up batch leaves the earlier quarantine intact
    write_jsonl(
        str(stream_dir / "b2.json"),
        [member_env(2, "e2", "MODIFY", "m3", "Caroline", BASE_MS + 2000)],
    )
    pipe.refresh()
    assert pipe.quarantine_table().count() == 2
    assert {r.memberName for r in pipe.table("member").collect()} >= {"Caroline"}


# ---- json_extract_path_text parity: '' vs NULL, declared-length truncation
def test_extract_redshift_null_semantics_and_truncation(spark):
    import json as _json

    from example_cdk_dynamodb_stream_to_redshift_spark.schemas import (
        KINESIS_RECORD_SCHEMA,
    )

    arrival = dt.datetime(2023, 11, 15)
    long_pk = "M_" + "x" * 70  # > varchar(50)

    def rec(seq, payload: str):
        return (arrival, "pk", "shard-0", str(seq).zfill(20), payload.encode())

    no_user_identity = {
        "eventID": "e" * 40,  # > varchar(30)
        "awsRegion": "us-east-1",
        "eventName": "MODIFY",
        # userIdentity MISSING entirely (the reference fixture always has
        # the key; a real envelope may omit it)
        "tableName": "activity",
        "eventSource": "aws:dynamodb",
        "dynamodb": {
            "ApproximateCreationDateTime": 1700000000000,
            "Keys": {"pk": {"S": long_pk}, "sk": {"S": "name"}},
        },
    }
    recs = spark.createDataFrame(
        [
            rec(1, _json.dumps(no_user_identity)),
            rec(2, "{broken json"),
            rec(3, _json.dumps({"foo": "bar"})),  # JSON, not an envelope
        ],
        KINESIS_RECORD_SCHEMA,
    )
    rows = {r["sequencenumber"]: r for r in build_extract(recs).collect()}

    env_row = rows["1".zfill(20)]
    # missing field in a valid envelope -> '' (json_extract_path_text on a
    # missing path), never NULL
    assert env_row["userIdentity"] == ""
    # declared widths truncate exactly like Redshift's ::varchar(n) casts
    assert env_row["eventID"] == "e" * 30
    assert env_row["pk"] == long_pk[:50] and len(env_row["pk"]) == 50
    assert env_row["eventName"] == "MODIFY"

    # non-envelope payloads keep NULL scalars — the quarantine marker
    for seq in ("2".zfill(20), "3".zfill(20)):
        assert rows[seq]["eventID"] is None
        assert rows[seq]["userIdentity"] is None
        assert rows[seq]["pk"] is None


# ---- continuous mode: the 1-minute EventBridge loop as processingTime ----
def test_continuous_mode_processes_successive_batches(spark, tmp_path):
    import time

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
    pipe = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh"))
    pipe.initial_load(str(export_dir), sync_ts=OLD)

    write_jsonl(
        str(stream_dir / "b1.json"),
        [member_env(1, "e1", "INSERT", "m2", "Bob", BASE_MS + 1000)],
    )
    query = pipe.start(processing_time="1 seconds")
    try:

        def wait_for(pred, deadline=60.0):
            t0 = time.time()
            while time.time() - t0 < deadline:
                if pred():
                    return True
                time.sleep(0.5)
            return False

        assert wait_for(
            lambda: {r.memberId for r in pipe.table("member").collect()}
            == {"m1", "m2"}
        ), "first batch not merged by continuous trigger"

        # second file arrives while the query keeps running — no manual
        # refresh() call; the processingTime trigger must pick it up
        write_jsonl(
            str(stream_dir / "b2.json"),
            [member_env(2, "e2", "MODIFY", "m2", "Bobby", BASE_MS + 2000)],
        )
        assert wait_for(
            lambda: {
                r.memberId: r.memberName for r in pipe.table("member").collect()
            }.get("m2")
            == "Bobby"
        ), "second batch not merged by continuous trigger"
    finally:
        query.stop()
        query.awaitTermination()

    # checkpoint is shared with AvailableNow mode: a follow-up manual
    # refresh() reprocesses nothing (no duplicate MV rows)
    pipe.refresh()
    assert pipe.extract_table().count() == 2


def test_sequence_tiebreak_survives_oversized_sequence_numbers(spark, tmp_path):
    # Kinesis sequence numbers run to ~56 digits; a fixed-width lpad would
    # silently truncate (and invert) anything longer. The (length, value)
    # ordering must rank a 60-digit number above any shorter one.
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.merge import (
        MEMBER_SPEC,
        stage_changes,
    )

    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(str(export_dir / "p0.json"), [member_item("m1", "A")])

    big = int("9" * 60)  # longer than any fixed pad width
    small = 7
    envs = [
        member_env(small, "e1", "MODIFY", "m1", "FromSmallSeq", BASE_MS + 1000),
        member_env(big, "e2", "MODIFY", "m1", "FromBigSeq", BASE_MS + 1000),
    ]
    # same second-precision event time -> the sequence number is the ONLY
    # tie-break; the 60-digit one must win
    write_jsonl(str(stream_dir / "b.json"), envs)
    from example_cdk_dynamodb_stream_to_redshift_spark.sources.cdc_envelope import (
        read_cdc_records,
    )

    extract = build_extract(read_cdc_records(spark, str(stream_dir)))
    staged = stage_changes(extract, MEMBER_SPEC, OLD).collect()
    assert len(staged) == 1
    assert staged[0]["memberName"] == "FromBigSeq"


def test_scd2_member_history_from_change_stream(spark, tmp_path):
    # Beyond-reference SCD Type 2: the reference's merge would leave only
    # the latest member row (deleting history); scd2_history keeps every
    # version as a half-open validity interval, and a REMOVE closes the
    # last interval without emitting a row.
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.merge import (
        MEMBER_SPEC,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.scd import (
        as_of,
        scd2_history,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.sources.cdc_envelope import (
        read_cdc_records,
    )

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    envs = [
        member_env(1, "e1", "INSERT", "m1", "Alice", BASE_MS),
        member_env(2, "e2", "MODIFY", "m1", "Alicia", BASE_MS + 60_000),
        member_env(3, "e3", "REMOVE", "m1", "", BASE_MS + 120_000),
        member_env(4, "e4", "INSERT", "m2", "Bob", BASE_MS),
    ]
    write_jsonl(str(stream_dir / "b.json"), envs)
    extract = build_extract(read_cdc_records(spark, str(stream_dir)))
    changes = MEMBER_SPEC.project(extract)

    hist = scd2_history(
        changes,
        key_cols=["memberId"],
        ts_col="approximateUpdateTimestamp",
        tie_cols=["sequencenumber"],
        event_col="eventName",
    )
    rows = {(r["memberId"], r["memberName"]): r for r in hist.collect()}
    assert set(rows) == {("m1", "Alice"), ("m1", "Alicia"), ("m2", "Bob")}

    alice, alicia = rows[("m1", "Alice")], rows[("m1", "Alicia")]
    # intervals tile: Alice closes exactly where Alicia opens
    assert alice["valid_to"] == alicia["valid_from"]
    # the REMOVE closed Alicia's interval and emitted no row
    assert alicia["valid_to"] is not None and alicia["is_current"] == 0
    # a fully removed key has no current version
    assert not [r for (k, _), r in rows.items() if k == "m1" and r["is_current"]]
    assert rows[("m2", "Bob")]["is_current"] == 1

    # point-in-time: between the rename and the remove, m1 was "Alicia"
    snap = {
        r["memberId"]: r["memberName"]
        for r in as_of(hist, alicia["valid_from"]).collect()
    }
    assert snap == {"m1": "Alicia", "m2": "Bob"}


@pytest.mark.parametrize("partitioned", [False, True], ids=["full", "bucketed"])
def test_sync_log_rows_across_two_refreshes(spark, tmp_path, partitioned):
    # SVL_STORED_PROC_MESSAGES parity (sql/incremental_sync_members.sql:61-66):
    # every entity merge of every micro-batch appends one queryable log row
    # with the watermark it ran against and staged/deleted/inserted counts —
    # identical on both storage backends (the bucketed one counts deletes on
    # the pruned slice only).
    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(
        str(export_dir / "p0.json"),
        [member_item("m1", "Alice"), member_item("m2", "Bob"),
         quest_item("q1", "Q"), member_quest_item("mq1", "m1", "q1", "10.00")],
    )
    pipe = CdcPipeline(
        spark, str(stream_dir), str(tmp_path / "wh"), partitioned=partitioned
    )
    assert pipe.sync_log_table().count() == 0  # empty, schema intact
    assert "staged_count" in pipe.sync_log_table().columns
    pipe.initial_load(str(export_dir), sync_ts=OLD)

    # batch 0: new member (INSERT+MODIFY collapse), a REMOVE, one new mq
    write_jsonl(
        str(stream_dir / "b1.json"),
        [
            member_env(1, "e1", "INSERT", "m3", "Carol", BASE_MS + 1000),
            member_env(2, "e2", "MODIFY", "m3", "Caroline", BASE_MS + 2000),
            member_env(3, "e3", "REMOVE", "m2", "Bob", BASE_MS + 3000),
            mq_env(4, "e4", "INSERT", "mq2", "m3", "q1", "25.50", BASE_MS + 4000),
        ],
    )
    pipe.refresh()
    log0 = {r["entity"]: r for r in pipe.sync_log_table().collect()}
    assert set(log0) == {"member", "quest", "member_quest"}
    m0 = log0["member"]
    # m3's two changes collapse to one staged row; m2's REMOVE stages too
    assert m0["staged_count"] == 2
    assert m0["deleted_count"] == 1      # only m2 existed in the target
    assert m0["inserted_count"] == 1     # the REMOVE is not re-inserted
    assert m0["watermark"] == OLD        # pre-merge watermark recorded
    assert m0["sync_ts"] is not None
    assert "Staged 2 member records" in m0["message"]
    assert log0["quest"]["staged_count"] == 0   # untouched entity logs zeros
    assert log0["member_quest"]["staged_count"] == 1
    assert log0["member_quest"]["deleted_count"] == 0

    # batch 1: one modify of an existing member
    write_jsonl(
        str(stream_dir / "b2.json"),
        [member_env(5, "e5", "MODIFY", "m1", "Alicia", BASE_MS + 9000)],
    )
    pipe.refresh()
    log = pipe.sync_log_table()
    assert log.count() == 6  # 3 entities x 2 batches
    m1 = {r["entity"]: r for r in log.filter("batch_id = 1").collect()}["member"]
    assert (m1["staged_count"], m1["deleted_count"], m1["inserted_count"]) == (
        1, 1, 1,
    )
    # batch 1 ran against the watermark batch 0 advanced to: m3's event time
    # (BASE_MS+2000, second precision). The m2 REMOVE had a later event time
    # but REMOVEs are never inserted, so they cannot advance the watermark.
    assert m1["watermark"] == dt.datetime.fromtimestamp(
        (BASE_MS + 2000) // 1000, dt.timezone.utc
    ).replace(tzinfo=None)


def test_pipeline_history_table_spans_refreshes(spark, tmp_path):
    # history_table derives SCD2 versions from the accumulated extract, so
    # versions from different micro-batches stitch into one timeline.
    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(
        str(export_dir / "p0.json"),
        [member_item("m1", "Alice"), quest_item("q1", "Q"),
         member_quest_item("mq1", "m1", "q1", "1")],
    )
    pipe = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh"))
    pipe.initial_load(str(export_dir), sync_ts=OLD)

    write_jsonl(str(stream_dir / "b1.json"),
                [member_env(1, "e1", "MODIFY", "m1", "Alicia", BASE_MS + 1000)])
    pipe.refresh()
    write_jsonl(str(stream_dir / "b2.json"),
                [member_env(2, "e2", "MODIFY", "m1", "Alize", BASE_MS + 60_000)])
    pipe.refresh()

    hist = sorted(
        pipe.history_table("member").collect(),
        key=lambda r: r["valid_from"],
    )
    assert [r["memberName"] for r in hist] == ["Alicia", "Alize"]
    # cross-batch interval stitching: batch-1's version closes at batch-2's
    assert hist[0]["valid_to"] == hist[1]["valid_from"]
    assert (hist[0]["is_current"], hist[1]["is_current"]) == (0, 1)


def test_pipeline_compact_preserves_stores(spark, tmp_path):
    """CdcPipeline.compact(): extract / sync-log batch dirs consolidate
    with rows (and batch_id lineage) intact, keep_last protects the
    replayable tail, SCD2 history still derives from the compacted
    change log, and subsequent refreshes keep working."""
    import glob
    import os as _os

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
    pipe = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh"))
    pipe.initial_load(str(export_dir), sync_ts=OLD)
    for i, (eid, name, ms) in enumerate(
        [("e1", "A1", 1000), ("e2", "A2", 2000), ("e3", "A3", 3000)]
    ):
        write_jsonl(
            str(stream_dir / f"b{i}.json"),
            [member_env(i + 1, eid, "MODIFY", "m1", name, BASE_MS + ms)],
        )
        pipe.refresh()

    extract_before = sorted(map(str, pipe.extract_table().collect()))
    log_before = sorted(
        (r["batch_id"], r["entity"], r["staged_count"])
        for r in pipe.sync_log_table().collect()
    )
    wh = str(tmp_path / "wh")
    assert len(glob.glob(_os.path.join(wh, "member_quest_data_extract", "batch_id=*"))) == 3

    pipe.compact(keep_last=1)
    # newest batch dir protected for replay; older two folded into one
    assert len(glob.glob(_os.path.join(wh, "member_quest_data_extract", "batch_id=*"))) == 1
    assert len(glob.glob(_os.path.join(wh, "member_quest_data_extract", "compact=*"))) == 1
    assert sorted(map(str, pipe.extract_table().collect())) == extract_before
    assert (
        sorted(
            (r["batch_id"], r["entity"], r["staged_count"])
            for r in pipe.sync_log_table().collect()
        )
        == log_before
    )
    # SCD2 history derives from the compacted change log unchanged
    hist = pipe.history_table("member").filter("memberId = 'm1'").collect()
    assert [r["memberName"] for r in sorted(hist, key=lambda r: r["valid_from"])][-3:] == [
        "A1", "A2", "A3",
    ]
    # the pipeline keeps ingesting after compaction
    write_jsonl(
        str(stream_dir / "b3.json"),
        [member_env(9, "e9", "MODIFY", "m1", "A4", BASE_MS + 9000)],
    )
    pipe.refresh()
    assert pipe.table("member").collect()[0]["memberName"] == "A4"
    assert pipe.extract_table().count() == 4


def test_progress_log_records_engine_metrics(spark, tmp_path):
    """Each refresh appends Spark's per-trigger metrics: input row counts
    match the envelope volumes, batch ids advance, durations are real."""
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
    pipe = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh"))
    pipe.initial_load(str(export_dir), sync_ts=OLD)
    assert pipe.progress_log_table().count() == 0  # schema-stable empty

    write_jsonl(
        str(stream_dir / "b0.json"),
        [member_env(i, f"e{i}", "MODIFY", "m1", f"A{i}", BASE_MS + i * 1000)
         for i in range(1, 4)],
    )
    pipe.refresh()
    write_jsonl(
        str(stream_dir / "b1.json"),
        [member_env(9, "e9", "MODIFY", "m1", "A9", BASE_MS + 9000)],
    )
    pipe.refresh()

    rows = {r["batch_id"]: r for r in pipe.progress_log_table().collect()}
    assert rows[0]["num_input_rows"] == 3
    assert rows[1]["num_input_rows"] == 1
    assert all(r["trigger_ms"] > 0 for r in rows.values())
    assert len({r["run_id"] for r in rows.values()}) == 2  # one per refresh


# ---- maintained rewards view over the CDC stream (delta-mode IVM) ----
@pytest.mark.parametrize("partitioned", [False, True])
def test_maintained_rewards_view_tracks_cdc(spark, tmp_path, partitioned):
    """The reference's rewards report (sql/queries.sql:24-33) maintained
    instead of recomputed: an IncrementalAggTable fed the merge's own
    before/after images stays bit-identical to the from-scratch GROUP BY
    over the member_quest target through INSERT + MODIFY + REMOVE, and
    its freshness is stamped into the sync log."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.agg_maintenance import (
        IncrementalAggTable,
    )

    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(
        str(export_dir / "part0.json"),
        [
            member_item("m1", "Alice"),
            quest_item("q1", "Walk 10,000 steps"),
            member_quest_item("mq1", "m1", "q1", "10.00"),
        ],
    )
    pipe = CdcPipeline(
        spark, str(stream_dir), str(tmp_path / "wh"), partitioned=partitioned
    )
    pipe.initial_load(str(export_dir), sync_ts=OLD)

    mv = IncrementalAggTable(
        spark,
        str(tmp_path / "rewards_mv"),
        key_cols=["memberId"],
        key_types=[T.StringType()],
        aggs=[("n_quests", "count", None), ("total", "sum", "dollarsEarned")],
        out_types={"total": T.DoubleType()},
        retractable=True,
    )
    mv.bootstrap(pipe.table("member_quest"))
    pipe.attach_maintained_view(
        "rewards", "member_quest", mv, ["memberId", "dollarsEarned"]
    )

    def mv_state():
        return {
            r["memberId"]: (r["n_quests"], r["total"])
            for r in mv.read().collect()
        }

    def recomputed():
        return {
            r["memberId"]: (r["n"], r["t"])
            for r in pipe.table("member_quest")
            .groupBy("memberId")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dollarsEarned").alias("t"))
            .collect()
        }

    assert mv_state() == {"m1": (1, 10.0)}

    write_jsonl(
        str(stream_dir / "b1.json"),
        [
            mq_env(1, "e1", "INSERT", "mq2", "m3", "q1", "25.50", BASE_MS + 1000),
            mq_env(2, "e2", "MODIFY", "mq1", "m1", "q1", "12.00", BASE_MS + 2000),
        ],
    )
    pipe.refresh()
    assert mv_state() == {"m1": (1, 12.0), "m3": (1, 25.5)}
    assert mv_state() == recomputed()

    write_jsonl(
        str(stream_dir / "b2.json"),
        [
            mq_env(3, "e3", "REMOVE", "mq1", "m1", None, None, BASE_MS + 3000),
            mq_env(4, "e4", "INSERT", "mq3", "m3", "q1", "1.50", BASE_MS + 4000),
        ],
    )
    pipe.refresh()
    assert mv_state() == {"m3": (2, 27.0)}  # m1's group emptied -> deleted
    assert mv_state() == recomputed()
    assert mv.last_applied() == 1

    # freshness rows in the sync log: one mv: row per batch with the delta
    # decomposition (upserts vs retractions) riding the state write
    log = {
        r["batch_id"]: (r["staged_count"], r["deleted_count"], r["inserted_count"])
        for r in pipe.sync_log_table().filter("entity = 'mv:rewards'").collect()
    }
    # b1: old mq1 retracted, new mq1 + mq2 inserted; b2: old mq1 retracted,
    # mq3 inserted (REMOVE contributes no insert)
    assert log == {0: (3, 1, 2), 1: (2, 1, 1)}
    wm = {
        r["batch_id"]: r["watermark"]
        for r in pipe.sync_log_table().filter("entity = 'mv:rewards'").collect()
    }
    assert wm[0] == OLD  # batch 0 staged against the initial-load watermark


def test_reference_rewards_report_served_from_maintained_view(spark, tmp_path):
    """The reference's rewards_by_member report (sql/queries.sql:22-32)
    served FROM the maintained view: join the incrementally-maintained
    per-member aggregate with the member dim at read time and it must
    equal the recompute-on-query form (plans/queries.rewards_by_member
    over the live targets) after inserts, modifies, and removes — the
    complete maintain-on-ingest replacement for the reference's
    recompute-per-query architecture."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from example_cdk_dynamodb_stream_to_redshift_spark.plans.queries import (
        rewards_by_member,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.streaming.agg_maintenance import (
        IncrementalAggTable,
    )

    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(
        str(export_dir / "part0.json"),
        [
            member_item("m1", "Alice"),
            member_item("m3", "Carol"),
            quest_item("q1", "Walk"),
            member_quest_item("mq1", "m1", "q1", "10.00"),
            member_quest_item("mq2", "m3", "q1", "4.00"),
        ],
    )
    pipe = CdcPipeline(spark, str(stream_dir), str(tmp_path / "wh"))
    pipe.initial_load(str(export_dir), sync_ts=OLD)

    mv = IncrementalAggTable(
        spark,
        str(tmp_path / "rewards_mv"),
        key_cols=["memberId"],
        key_types=[T.StringType()],
        aggs=[("n_quests", "count", None), ("totalDollarsEarned", "sum", "dollarsEarned")],
        out_types={"totalDollarsEarned": T.DoubleType()},
        retractable=True,
    )
    mv.bootstrap(pipe.table("member_quest"))
    pipe.attach_maintained_view(
        "rewards", "member_quest", mv, ["memberId", "dollarsEarned"]
    )

    write_jsonl(
        str(stream_dir / "b1.json"),
        [
            mq_env(1, "e1", "MODIFY", "mq1", "m1", "q1", "12.50", BASE_MS + 1000),
            mq_env(2, "e2", "INSERT", "mq3", "m1", "q1", "3.00", BASE_MS + 2000),
            mq_env(3, "e3", "REMOVE", "mq2", "m3", None, None, BASE_MS + 3000),
        ],
    )
    pipe.refresh()

    served = {
        (r["memberId"], r["memberName"]): r["totalDollarsEarned"]
        for r in mv.read()
        .join(F.broadcast(pipe.table("member")), "memberId")
        .select("memberId", "memberName", "totalDollarsEarned")
        .collect()
    }
    recomputed = {
        (r["memberId"], r["memberName"]): r["totalDollarsEarned"]
        for r in rewards_by_member(
            pipe.table("member_quest"), pipe.table("member")
        ).collect()
    }
    assert served == recomputed == {("m1", "Alice"): 15.5}


@pytest.mark.parametrize("partitioned", [False, True], ids=["full", "bucketed"])
def test_carried_watermark_matches_table_read_and_restart(
    spark, tmp_path, partitioned
):
    """The pipeline carries stats["next_watermark"] forward so warm
    refreshes skip the MAX(ts) target scan. The carried value must equal
    what a fresh table read would produce (so warm and cold paths stage
    identically), and a restarted pipeline (cold read, same checkpoint)
    must leave the targets byte-identical to the long-lived one."""
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.merge import (
        read_watermark,
    )

    export_dir = tmp_path / "export"
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    write_jsonl(
        str(export_dir / "p0.json"),
        [member_item("m1", "Alice"), member_item("m2", "Bob"),
         quest_item("q1", "Q"), member_quest_item("mq1", "m1", "q1", "10.00")],
    )

    def mk():
        return CdcPipeline(
            spark, str(stream_dir), str(tmp_path / "wh"),
            partitioned=partitioned,
        )

    pipe = mk()
    pipe.initial_load(str(export_dir), sync_ts=OLD)
    assert pipe._watermarks == {}  # cold: nothing carried yet
    write_jsonl(
        str(stream_dir / "b1.json"),
        [
            member_env(1, "e1", "INSERT", "m3", "Carol", BASE_MS + 1000),
            member_env(2, "e2", "REMOVE", "m2", "Bob", BASE_MS + 5000),
        ],
    )
    pipe.refresh()
    # carried == what a cold read of the post-merge target reports: the
    # REMOVE (later ts) never lands in the table, so neither side counts it
    carried = pipe._watermarks["member"]
    assert carried == read_watermark(pipe.table("member"))
    # restart: a NEW pipeline (empty carry) over the same warehouse +
    # checkpoint applies the next batch against the in-table watermark
    write_jsonl(
        str(stream_dir / "b2.json"),
        [member_env(3, "e3", "MODIFY", "m3", "Caroline", BASE_MS + 9000)],
    )
    pipe2 = mk()
    assert pipe2._watermarks == {}
    pipe2.refresh()
    rows = {
        r["memberId"]: r["memberName"]
        for r in pipe2.table("member").collect()
    }
    assert rows == {"m1": "Alice", "m3": "Caroline"}
    # the restart merge recorded the pre-merge watermark it READ from the
    # table — the same value the long-lived pipeline had carried
    log = pipe2.sync_log_table().filter(
        "entity = 'member' AND batch_id = 1"
    ).first()
    assert log["watermark"] == carried
    # and the carry advanced to the new event time
    assert pipe2._watermarks["member"] == dt.datetime.fromtimestamp(
        (BASE_MS + 9000) // 1000, dt.timezone.utc
    ).replace(tzinfo=None)
