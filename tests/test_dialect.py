"""Redshift-dialect shim: the reference's SQL artifacts run VERBATIM.

The four sql/queries.sql texts (including the file's literal
"memberNameORDER BY" typo), the stored-proc transform expressions
(sql/incremental_sync_members.sql), and the initial-load SELECT
(sql/initial_load_members.sql) are embedded here byte-faithfully and
executed through Engine.run_sql(dialect="redshift"); results must match
the DataFrame plans in plans/queries.py on the same inputs.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.dialect import rewrite
from example_cdk_dynamodb_stream_to_redshift_spark.plans import queries as Q
from example_cdk_dynamodb_stream_to_redshift_spark.schemas import TARGET_SCHEMAS

# sql/queries.sql:1-8
Q_RECENT_SYNCS = """
SELECT
    approximateUpdateTimestamp, syncTimestamp, (syncTimestamp - approximateUpdateTimestamp
    ) as syncLag
FROM
member
WHERE syncTimestamp IS NOT NULL
     ORDER BY syncTimestamp DESC LIMIT 5;
"""

# sql/queries.sql:11-19
Q_WORST_LAG_TODAY = """
SELECT
    approximateUpdateTimestamp, syncTimestamp, (syncTimestamp - approximateUpdateTimestamp
    ) as syncLag
FROM
member
WHERE
   TRUNC(approximateUpdateTimestamp) = CURRENT_DATE
     ORDER BY syncLag DESC LIMIT 5;
"""

# sql/queries.sql:22-32 — the "memberNameORDER BY" glue is IN the file
Q_REWARDS_BY_MEMBER = """
SELECT
    m.memberId, m.memberName, SUM(mq.dollarsEarned
    ) as totalDollarsEarned
FROM
    member_quest as mq, member as m
WHERE
    mq.memberId = m.memberId
GROUP
    BY m.memberId, m.memberNameORDER BY totalDollarsEarned DESC;
"""

# sql/queries.sql:35-45
Q_REWARDS_BY_QUEST = """
SELECT
    q.questId, q.questName, SUM(mq.dollarsEarned
    ) as totalDollarsEarned
FROM
    member_quest as mq, quest as q
WHERE
    q.questId = mq.questId
GROUP
    BY q.questId, q.questName
    ORDER BY totalDollarsEarned DESC;
"""

# sql/incremental_sync_members.sql:25-31 — the staged-transform SELECT
# (EXECUTE-string body with plpgsql quote-doubling undone)
Q_STAGE_MEMBERS = """
SELECT LTRIM(pk, 'M_' ) as memberId,
    sk as memberName,
    TIMESTAMP 'epoch' + eventData."ApproximateCreationDateTime"::BIGINT/1000 *INTERVAL '1 second' as approximateUpdateTimestamp,
    eventName
FROM member_quest_data_extract
WHERE pk LIKE 'M^_%' escape '^'
"""

# sql/initial_load_members.sql:2-9 — the initial-load SELECT
Q_INITIAL_LOAD_MEMBERS = """
SELECT
    LTRIM(item.pk."S"::varchar, 'M_' )::varchar as memberId,
    item.sk."S"::varchar as memberName,
    GETDATE()::timestamp as approximateUpdateTimestamp,
    'INITIAL_LOAD'::varchar as eventName,
    GETDATE()::timestamp as syncTimestamp
FROM
    dump_table
WHERE item.pk."S"::varchar LIKE 'M^_%' escape '^'
"""


@pytest.fixture(scope="module")
def cdc_views(spark):
    today = dt.datetime.now().replace(microsecond=0)
    yesterday = today - dt.timedelta(days=1)

    def ts(base, secs):
        return base + dt.timedelta(seconds=secs)

    member = spark.createDataFrame(
        [
            ("m1", "alice", ts(today, 0), "MODIFY", ts(today, 30)),
            ("m2", "bob", ts(today, 10), "MODIFY", ts(today, 15)),
            ("m3", "carol", ts(yesterday, 0), "INSERT", ts(yesterday, 90)),
            ("m4", "dave", ts(today, 20), "INSERT", None),
        ],
        TARGET_SCHEMAS["member"],
    )
    quest = spark.createDataFrame(
        [
            ("q1", "dragon", ts(yesterday, 0), "INSERT", ts(yesterday, 5)),
            ("q2", "kraken", ts(yesterday, 1), "INSERT", ts(yesterday, 6)),
        ],
        TARGET_SCHEMAS["quest"],
    )
    member_quest = spark.createDataFrame(
        [
            ("mq1", "m1", "q1", 10.0, ts(today, 1), "INSERT", ts(today, 2)),
            ("mq2", "m1", "q2", 2.5, ts(today, 2), "INSERT", ts(today, 3)),
            ("mq3", "m2", "q1", 4.0, ts(today, 3), "INSERT", ts(today, 4)),
        ],
        TARGET_SCHEMAS["member_quest"],
    )
    member.createOrReplaceTempView("member")
    quest.createOrReplaceTempView("quest")
    member_quest.createOrReplaceTempView("member_quest")
    return {"member": member, "quest": quest, "member_quest": member_quest}


def _run(spark, sql):
    return spark.sql(rewrite(sql))


def _rows(df, cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


def test_queries_sql_recent_syncs_verbatim(spark, cdc_views):
    got = _run(spark, Q_RECENT_SYNCS)
    want = Q.recent_syncs(cdc_views["member"]).select(
        "approximateUpdateTimestamp", "syncTimestamp", "syncLag"
    )
    cols = ["approximateUpdateTimestamp", "syncTimestamp", "syncLag"]
    assert _rows(got, cols) == _rows(want, cols)
    assert len(_rows(got, cols)) == 3  # NULL syncTimestamp excluded


def test_queries_sql_worst_lag_today_verbatim(spark, cdc_views):
    got = _run(spark, Q_WORST_LAG_TODAY)
    want = Q.worst_sync_lag_today(cdc_views["member"]).select(
        "approximateUpdateTimestamp", "syncTimestamp", "syncLag"
    )
    cols = ["approximateUpdateTimestamp", "syncTimestamp", "syncLag"]
    # ORDER BY syncLag DESC with NULL syncLag (dave): Redshift and Spark
    # both sort NULLs FIRST on DESC -> row order comparable directly
    assert _rows(got, cols) == _rows(want, cols)
    assert len(_rows(got, cols)) == 3  # yesterday's update excluded


def test_queries_sql_rewards_by_member_verbatim(spark, cdc_views):
    got = _run(spark, Q_REWARDS_BY_MEMBER)  # includes the glued-ORDER typo
    want = Q.rewards_by_member(cdc_views["member_quest"], cdc_views["member"])
    cols = ["memberId", "memberName", "totalDollarsEarned"]
    assert _rows(got, cols) == _rows(want, cols)
    assert _rows(got, cols)[0][2] == 12.5


def test_queries_sql_rewards_by_quest_verbatim(spark, cdc_views):
    got = _run(spark, Q_REWARDS_BY_QUEST)
    want = Q.rewards_by_quest(cdc_views["member_quest"], cdc_views["quest"])
    cols = ["questId", "questName", "totalDollarsEarned"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stored_proc_stage_transform_verbatim(spark):
    # envelope-extract fixture: one member row, one quest row (filtered out)
    import json

    from example_cdk_dynamodb_stream_to_redshift_spark.plans.extract import (
        build_extract,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.schemas import (
        KINESIS_RECORD_SCHEMA,
    )

    from .cdc_fixtures import envelope

    arrival = dt.datetime(2023, 11, 15)

    def rec(seq, env):
        return (
            arrival,
            env["dynamodb"]["Keys"]["pk"]["S"],
            "shard-0",
            str(seq).zfill(20),
            json.dumps(env).encode(),
        )

    recs = spark.createDataFrame(
        [
            rec(1, envelope("e1", "MODIFY", "M_m9", "niners", 1700000123999)),
            rec(2, envelope("e2", "MODIFY", "Q_q9", "quest", 1700000123999)),
        ],
        KINESIS_RECORD_SCHEMA,
    )
    build_extract(recs).createOrReplaceTempView("member_quest_data_extract")
    rows = _run(spark, Q_STAGE_MEMBERS).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["memberId"] == "m9" and r["memberName"] == "niners"
    # epoch + ms/1000 * interval '1s': Redshift BIGINT division truncates
    # to whole seconds — 123999 ms -> 123 s, never 123.999
    assert r["approximateUpdateTimestamp"] == dt.datetime(
        2023, 11, 14, 22, 15, 23
    )


def test_initial_load_select_verbatim(spark):
    rows = [
        {"Item": {"pk": {"S": "M_m1"}, "sk": {"S": "alice"},
                  "memberId": {"S": "m1"}, "memberName": {"S": "alice"},
                  "questId": None, "dollarsEarned": None}},
        {"Item": {"pk": {"S": "Q_q1"}, "sk": {"S": "dragon"},
                  "memberId": None, "memberName": None,
                  "questId": {"S": "q1"}, "dollarsEarned": None}},
    ]
    from example_cdk_dynamodb_stream_to_redshift_spark.schemas import (
        EXPORT_LINE_SCHEMA,
    )

    spark.createDataFrame(rows, EXPORT_LINE_SCHEMA).select(
        F.col("Item").alias("item")
    ).createOrReplaceTempView("dump_table")
    out = _run(spark, Q_INITIAL_LOAD_MEMBERS).collect()
    assert len(out) == 1
    assert out[0]["memberId"] == "m1" and out[0]["memberName"] == "alice"
    assert out[0]["eventName"] == "INITIAL_LOAD"
    assert out[0]["syncTimestamp"] is not None


def test_varchar_cast_truncates_like_redshift(spark):
    # Redshift `::varchar(3)` truncates; Spark's own varchar cast does not
    assert _run(spark, "SELECT 'abcdef'::varchar(3) AS r").first()["r"] == "abc"


def test_engine_run_sql_dialect(spark, tmp_path):
    from example_cdk_dynamodb_stream_to_redshift_spark.engine import Engine

    eng = Engine(spark, "/root/testdata/sf0.001")
    df = eng.run_sql("SELECT GETDATE()::timestamp AS now", dialect="redshift")
    assert df.first()["now"] is not None
    with pytest.raises(ValueError):
        eng.run_sql("SELECT 1", dialect="oracle")
