"""Driver-visible sync-run-log query: SVL_STORED_PROC_MESSAGES parity.

The reference's stored procedures RAISE INFO per-statement diagnostics that
operators query back from SVL_STORED_PROC_MESSAGES
(/root/reference/sql/incremental_sync_members.sql:33,61-66). Our engine
writes the same diagnostics as a queryable parquet log
(streaming/pipeline.py sync_log_table): one row per entity-merge per
micro-batch with the watermark the merge ran against and the
staged/deleted/inserted row counts.

This module makes that log DRIVER-provable: ``sync_run_log`` derives a
deterministic CDC fixture from the driver's ``events`` table (entity routed
by event_id % 3, key by user_id, REMOVE every 7th event, event time
base + (event_id+1) seconds), bootstraps the targets with the
user_id-even half of the keys at the watermark, runs the REAL pipeline
(Structured Streaming AvailableNow refresh -> foreachBatch 3-entity merge ->
sync-log write), and returns the log's deterministic columns. The DuckDB
oracle re-derives every count analytically from ``events``:

- staged_count   = distinct keys routed to the entity (all events are newer
                   than the watermark, and staging collapses to latest-per-
                   key, sql/incremental_sync_members.sql:38-40)
- deleted_count  = staged keys that pre-existed in the target
                   (= user_id even, the bootstrap set) — the DELETE..USING
                   row count (sql/incremental_sync_members.sql:44)
- inserted_count = staged keys whose LATEST change is not a REMOVE
                   (sql/incremental_sync_members.sql:46-52)
- watermark      = the bootstrap timestamp (A1 read,
                   sql/incremental_sync_members.sql:11)

Wall-clock columns (sync_ts, message text) are excluded — the reference's
proc messages embed GETDATE() the same way; only the deterministic payload
is hash-checked.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table
from .inventory import register

# 2024-01-01 00:00:00 UTC — the bootstrap watermark
_BASE_EPOCH_S = 1704067200
_ARRIVAL = "2024-01-01T00:00:00.000Z"


def _av(col: F.Column) -> F.Column:
    """DynamoDB attribute-value string wrapper {"S": ...}."""
    return F.struct(col.alias("S"))


def _envelope_lines(events: DataFrame) -> DataFrame:
    """events rows -> one JSON-lines kinesis record per event (distributed
    construction, written with df.write.text — no driver-side loop).

    Routing: event_id % 3 -> member / quest / member_quest; key u<user_id>;
    eventName REMOVE when event_id % 7 == 0 (NewImage omitted, as DynamoDB
    does); ApproximateCreationDateTime strictly after the watermark and
    unique per event, so latest-per-key is decided by event time alone
    (no tie-break ambiguity between engines).
    """
    e = events.select(
        F.col("event_id"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("uid"),
        (F.col("event_id") % 3).alias("route"),
        F.when(F.col("event_id") % 7 == 0, F.lit("REMOVE"))
        .otherwise(F.lit("MODIFY"))
        .alias("event_name"),
        ((F.lit(_BASE_EPOCH_S) + F.col("event_id") + 1) * 1000).alias("creation_ms"),
    )

    def branch(df: DataFrame, pk: F.Column, sk: F.Column, image: F.Column) -> DataFrame:
        env = F.to_json(
            F.struct(
                F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("eventID"),
                F.lit("us-east-1").alias("awsRegion"),
                F.col("event_name").alias("eventName"),
                F.lit("activity").alias("tableName"),
                F.lit("aws:dynamodb").alias("eventSource"),
                F.struct(
                    F.col("creation_ms").alias("ApproximateCreationDateTime"),
                    F.struct(_av(pk).alias("pk"), _av(sk).alias("sk")).alias("Keys"),
                    # to_json drops null fields: REMOVE envelopes carry no
                    # NewImage, exactly like the DynamoDB stream shape
                    F.when(F.col("event_name") == "REMOVE", F.lit(None))
                    .otherwise(image)
                    .alias("NewImage"),
                ).alias("dynamodb"),
            )
        )
        return df.select(
            F.to_json(
                F.struct(
                    F.lit(_ARRIVAL).alias("approximate_arrival_timestamp"),
                    pk.alias("partition_key"),
                    F.lit("shardId-000000000000").alias("shard_id"),
                    F.lpad(F.col("event_id").cast("string"), 20, "0").alias(
                        "sequence_number"
                    ),
                    env.alias("kinesis_data"),
                )
            ).alias("value")
        )

    uid = F.col("uid")
    member = branch(
        e.filter(F.col("route") == 0),
        F.concat(F.lit("M_"), uid),
        F.concat(F.lit("name-"), uid),
        F.struct(
            _av(F.concat(F.lit("M_"), uid)).alias("pk"),
            _av(F.concat(F.lit("name-"), uid)).alias("sk"),
            _av(uid).alias("memberId"),
            _av(F.concat(F.lit("name-"), uid)).alias("memberName"),
        ),
    )
    quest = branch(
        e.filter(F.col("route") == 1),
        F.concat(F.lit("Q_"), uid),
        F.concat(F.lit("quest-"), uid),
        F.struct(
            _av(F.concat(F.lit("Q_"), uid)).alias("pk"),
            _av(F.concat(F.lit("quest-"), uid)).alias("sk"),
            _av(uid).alias("questId"),
        ),
    )
    member_quest = branch(
        e.filter(F.col("route") == 2),
        F.concat(F.lit("MQ#M_"), uid),
        F.concat(F.lit("MQ_"), uid),
        F.struct(
            _av(F.concat(F.lit("MQ#M_"), uid)).alias("pk"),
            _av(F.concat(F.lit("MQ_"), uid)).alias("sk"),
            _av(uid).alias("questId"),
            F.struct(F.lit("1.50").alias("N")).alias("dollarsEarned"),
        ),
    )
    return member.unionByName(quest).unionByName(member_quest)


def _bootstrap_targets(pipeline, events: DataFrame) -> None:
    """Initial-load the targets with the user_id-even half of the keys at
    the watermark timestamp (every merge then sees watermark = base and
    deletes exactly the staged keys in this set)."""
    base_ts = F.timestamp_seconds(F.lit(_BASE_EPOCH_S))
    keys = (
        events.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("uid")
        )
        .filter(F.col("user_id") % 2 == 0)
        .distinct()
    )
    common = [
        base_ts.alias("approximateUpdateTimestamp"),
        F.lit("INITIAL_LOAD").alias("eventName"),
        base_ts.alias("syncTimestamp"),
    ]
    uid = F.col("uid")
    pipeline.targets["member"].overwrite(
        keys.select(
            uid.alias("memberId"),
            F.concat(F.lit("name-"), uid).alias("memberName"),
            *common,
        )
    )
    pipeline.targets["quest"].overwrite(
        keys.select(
            uid.alias("questId"),
            F.concat(F.lit("quest-"), uid).alias("questName"),
            *common,
        )
    )
    pipeline.targets["member_quest"].overwrite(
        keys.select(
            uid.alias("memberQuestId"),
            uid.alias("memberId"),
            uid.alias("questId"),
            F.lit(0.0).alias("dollarsEarned"),
            *common,
        )
    )


@register(
    "sync_run_log",
    """
    WITH e AS (
      SELECT event_id, user_id,
             CASE CAST(event_id % 3 AS INTEGER)
               WHEN 0 THEN 'member' WHEN 1 THEN 'quest'
               ELSE 'member_quest' END AS entity
      FROM events),
    latest AS (
      SELECT entity, user_id, MAX(event_id) AS last_id
      FROM e GROUP BY entity, user_id),
    c AS (
      SELECT entity,
             CAST(COUNT(*) AS BIGINT) AS staged_count,
             CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
               AS deleted_count,
             CAST(COUNT(*) FILTER (WHERE last_id % 7 <> 0) AS BIGINT)
               AS inserted_count
      FROM latest GROUP BY entity)
    SELECT entity, TIMESTAMP '2024-01-01 00:00:00' AS watermark,
           staged_count, deleted_count, inserted_count
    FROM c ORDER BY entity
    """,
    "Sync-run log, driver-proved end-to-end (SVL_STORED_PROC_MESSAGES "
    "analytics parity, sql/incremental_sync_members.sql:33,61-66): a "
    "deterministic CDC fixture derived from the events table runs through "
    "the REAL pipeline — envelope JSONL (distributed write), Structured "
    "Streaming AvailableNow refresh, concurrent 3-entity watermark merge, "
    "sync-log parquet write — and the log's deterministic columns "
    "(entity, watermark, staged/deleted/inserted counts) hash-match the "
    "oracle's analytic re-derivation of every count. Wall-clock sync_ts "
    "and message text excluded by design.",
)
def sync_run_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import CdcPipeline

    events = load_table(spark, sf_dir, "events")
    workdir = tempfile.mkdtemp(prefix="sync_run_log_")
    try:
        stream_dir = os.path.join(workdir, "stream")
        _envelope_lines(events).write.mode("overwrite").text(stream_dir)
        pipeline = CdcPipeline(
            spark, stream_dir, os.path.join(workdir, "warehouse")
        )
        _bootstrap_targets(pipeline, events)
        pipeline.refresh()
        rows = (
            pipeline.sync_log_table()
            .select(
                "entity",
                "watermark",
                "staged_count",
                "deleted_count",
                "inserted_count",
            )
            .orderBy("entity")
            .collect()
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    # materialized before the fixture dir is deleted: the 3-row log is
    # re-wrapped locally so the returned DataFrame has no file dependency
    schema = T.StructType(
        [
            T.StructField("entity", T.StringType()),
            T.StructField("watermark", T.TimestampType()),
            T.StructField("staged_count", T.LongType()),
            T.StructField("deleted_count", T.LongType()),
            T.StructField("inserted_count", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema).orderBy("entity")


@register(
    "incremental_mv_user_value",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    "Incremental view maintenance, driver-proven end-to-end: the events "
    "table is split into 3 deterministic micro-batches (event_id % 3) "
    "and fed through IncrementalAggTable "
    "(streaming/agg_maintenance.py) — per batch ONE partial aggregation "
    "merged group-wise into the versioned state (count/sum/min/max "
    "algebra, sum in exact DECIMAL so merge order cannot show), ledgered "
    "exactly-once via the atomic pointer metadata. The oracle is the "
    "one-shot GROUP BY over the same events: the maintained MV must "
    "equal the from-scratch aggregate bit-for-bit. This is the "
    "reference's report family (sql/queries.sql:22-45) upgraded from "
    "recompute-on-query to maintain-on-ingest: at 100 TB each refresh "
    "costs the micro-batch, never the history.",
)
def incremental_mv_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import types as T

    from ..streaming.agg_maintenance import IncrementalAggTable

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    root = tempfile.mkdtemp(prefix="ivm_mv_")
    try:
        t = IncrementalAggTable(
            spark,
            os.path.join(root, "mv"),
            key_cols=["user_id"],
            key_types=[T.LongType()],
            aggs=[
                ("n_events", "count", None),
                ("total_value", "sum", "value"),
                ("min_value", "min", "value"),
                ("max_value", "max", "value"),
            ],
            out_types={
                "total_value": T.DecimalType(18, 2),
                "min_value": T.DoubleType(),
                "max_value": T.DoubleType(),
            },
        )
        for i in range(3):  # three deterministic micro-batches
            t.apply_batch(events.filter(F.col("event_id") % 3 == i), i)
        rows = (
            t.read()
            .select(
                "user_id",
                "n_events",
                F.col("total_value").cast("double").alias("total_value"),
                "min_value",
                "max_value",
            )
            .orderBy("user_id")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    # re-wrapped locally (the sync_run_log convention) so the returned
    # DataFrame has no dependency on the deleted fixture warehouse
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("min_value", T.DoubleType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )
    return spark.createDataFrame([tuple(r) for r in rows], schema)


# ---------------------------------------------------------------------------
# CDC-maintained rewards view (delta-mode IVM, driver-proved end-to-end)
# ---------------------------------------------------------------------------

# wave split: events below go in refresh 1, the rest in refresh 2 — chosen
# so BOTH waves are non-empty at every testdata SF (events has 1000 rows
# at sf0.001)
_WAVE_SPLIT = 500


def _mq_envelope_lines(events: DataFrame) -> DataFrame:
    """events rows -> member_quest CDC envelopes (distributed JSON-lines
    construction, same transport shape as _envelope_lines): key
    q<event_id % 97> so keys see INSERT/MODIFY chains, member
    m<kid % 10>, REMOVE every 11th event, INSERT every 5th (semantically
    an upsert either way — the REMOVE cadence is what the merge and the
    maintained view must get right), dollars ((event_id % 500)+1)*0.25
    (exact binary quarters: maintained sums stay bit-exact), event time
    base + event_id + 1 so latest-per-key is decided by event time
    alone."""
    e = events.select(
        "event_id",
        (F.col("event_id") % 97).cast("int").alias("kid"),
        F.when(F.col("event_id") % 11 == 0, F.lit("REMOVE"))
        .when(F.col("event_id") % 5 == 0, F.lit("INSERT"))
        .otherwise(F.lit("MODIFY"))
        .alias("event_name"),
        ((F.col("event_id") % 500 + 1) * F.lit(0.25))
        .cast("decimal(10,2)")
        .cast("string")
        .alias("dollars"),
        ((F.lit(_BASE_EPOCH_S) + F.col("event_id") + 1) * 1000).alias(
            "creation_ms"
        ),
    ).select(
        "event_id",
        "event_name",
        "dollars",
        "creation_ms",
        F.concat(F.lit("MQ#M_m"), (F.col("kid") % 10).cast("string")).alias("pk"),
        F.concat(F.lit("MQ_q"), F.col("kid").cast("string")).alias("sk"),
    )
    env = F.to_json(
        F.struct(
            F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("eventID"),
            F.lit("us-east-1").alias("awsRegion"),
            F.col("event_name").alias("eventName"),
            F.lit("activity").alias("tableName"),
            F.lit("aws:dynamodb").alias("eventSource"),
            F.struct(
                F.col("creation_ms").alias("ApproximateCreationDateTime"),
                F.struct(
                    _av(F.col("pk")).alias("pk"), _av(F.col("sk")).alias("sk")
                ).alias("Keys"),
                F.when(F.col("event_name") == "REMOVE", F.lit(None))
                .otherwise(
                    F.struct(
                        _av(F.col("pk")).alias("pk"),
                        _av(F.col("sk")).alias("sk"),
                        _av(F.lit("qx")).alias("questId"),
                        F.struct(F.col("dollars").alias("N")).alias(
                            "dollarsEarned"
                        ),
                    )
                )
                .alias("NewImage"),
            ).alias("dynamodb"),
        )
    )
    return e.select(
        F.to_json(
            F.struct(
                F.lit(_ARRIVAL).alias("approximate_arrival_timestamp"),
                F.col("pk").alias("partition_key"),
                F.lit("shardId-000000000000").alias("shard_id"),
                F.lpad(F.col("event_id").cast("string"), 20, "0").alias(
                    "sequence_number"
                ),
                env.alias("kinesis_data"),
            )
        ).alias("value")
    )


# one fixture run serves both registered queries below (the MV state and
# its freshness log come out of the SAME two-refresh pipeline run); rows
# are collected before the workdir is deleted, so caching plain lists is
# safe across driver calls
_rewards_cdc_cache: dict[str, dict] = {}


def _rewards_cdc_fixture(spark: SparkSession, sf_dir: str) -> dict:
    from pyspark import StorageLevel  # noqa: F401  (import locality)

    from ..streaming.agg_maintenance import IncrementalAggTable
    from ..streaming.pipeline import CdcPipeline

    if sf_dir in _rewards_cdc_cache:
        return _rewards_cdc_cache[sf_dir]
    events = load_table(spark, sf_dir, "events").select("event_id")
    workdir = tempfile.mkdtemp(prefix="rewards_cdc_")
    try:
        stream_dir = os.path.join(workdir, "stream")
        _mq_envelope_lines(
            events.filter(F.col("event_id") < _WAVE_SPLIT)
        ).write.mode("overwrite").text(stream_dir)
        pipeline = CdcPipeline(
            spark, stream_dir, os.path.join(workdir, "warehouse")
        )
        base_ts = F.timestamp_seconds(F.lit(_BASE_EPOCH_S))
        common = [
            base_ts.alias("approximateUpdateTimestamp"),
            F.lit("INITIAL_LOAD").alias("eventName"),
            base_ts.alias("syncTimestamp"),
        ]
        one = spark.range(1)
        pipeline.targets["member"].overwrite(
            one.select(
                F.lit("seed").alias("memberId"),
                F.lit("seed").alias("memberName"),
                *common,
            )
        )
        pipeline.targets["quest"].overwrite(
            one.select(
                F.lit("seed").alias("questId"),
                F.lit("seed").alias("questName"),
                *common,
            )
        )
        # 30 bootstrap member_quest rows: q0..q19 (WILL be hit by the
        # stream wherever those kids occur — their old images must be
        # retracted) and b0..b9 (never streamed — must survive into the
        # maintained totals untouched)
        qkey = F.col("id") < 20
        pipeline.targets["member_quest"].overwrite(
            spark.range(30).select(
                F.when(
                    qkey, F.concat(F.lit("q"), F.col("id").cast("string"))
                )
                .otherwise(
                    F.concat(F.lit("b"), (F.col("id") - 20).cast("string"))
                )
                .alias("memberQuestId"),
                F.when(
                    qkey,
                    F.concat(F.lit("m"), (F.col("id") % 10).cast("string")),
                )
                .otherwise(
                    F.concat(
                        F.lit("mb"), ((F.col("id") - 20) % 5).cast("string")
                    )
                )
                .alias("memberId"),
                F.lit("qx").alias("questId"),
                F.lit(2.0).alias("dollarsEarned"),
                *common,
            )
        )
        mv = IncrementalAggTable(
            spark,
            os.path.join(workdir, "rewards_mv"),
            key_cols=["memberId"],
            key_types=[T.StringType()],
            aggs=[
                ("n_quests", "count", None),
                ("total_dollars", "sum", "dollarsEarned"),
            ],
            out_types={"total_dollars": T.DoubleType()},
            retractable=True,
        )
        mv.bootstrap(pipeline.targets["member_quest"].read())
        pipeline.attach_maintained_view(
            "rewards", "member_quest", mv, ["memberId", "dollarsEarned"]
        )
        pipeline.refresh()
        _mq_envelope_lines(
            events.filter(F.col("event_id") >= _WAVE_SPLIT)
        ).write.mode("append").text(stream_dir)
        pipeline.refresh()
        mv_rows = [
            tuple(r)
            for r in mv.read()
            .select(
                F.col("memberId").alias("member_id"),
                "n_quests",
                "total_dollars",
            )
            .orderBy("member_id")
            .collect()
        ]
        fresh_rows = [
            tuple(r)
            for r in pipeline.sync_log_table()
            .filter(F.col("entity") == "mv:rewards")
            .select(
                F.col("batch_id").cast("int").alias("batch_id"),
                "watermark",
                "staged_count",
                "deleted_count",
                "inserted_count",
            )
            .orderBy("batch_id")
            .collect()
        ]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    out = {"mv": mv_rows, "freshness": fresh_rows}
    _rewards_cdc_cache[sf_dir] = out
    return out


@register(
    "incremental_mv_rewards_cdc",
    """
    WITH e AS (
      SELECT event_id, CAST(event_id % 97 AS INTEGER) AS kid FROM events
    ),
    latest AS (SELECT kid, MAX(event_id) AS last_id FROM e GROUP BY kid),
    streamed AS (
      SELECT 'm' || CAST(kid % 10 AS VARCHAR) AS member_id,
             CAST(CAST(((last_id % 500) + 1) * 0.25 AS DECIMAL(10,2))
                  AS DOUBLE) AS dollars
      FROM latest WHERE last_id % 11 <> 0
    ),
    boot_survivors AS (
      SELECT 'm' || CAST(k % 10 AS VARCHAR) AS member_id,
             CAST(2.0 AS DOUBLE) AS dollars
      FROM generate_series(0, 19) AS t(k)
      WHERE k NOT IN (SELECT kid FROM e)
    ),
    b_rows AS (
      SELECT 'mb' || CAST(j % 5 AS VARCHAR) AS member_id,
             CAST(2.0 AS DOUBLE) AS dollars
      FROM generate_series(0, 9) AS t(j)
    ),
    fin AS (
      SELECT * FROM streamed
      UNION ALL SELECT * FROM boot_survivors
      UNION ALL SELECT * FROM b_rows
    )
    SELECT member_id, CAST(COUNT(*) AS BIGINT) AS n_quests,
           CAST(SUM(dollars) AS DOUBLE) AS total_dollars
    FROM fin GROUP BY member_id ORDER BY member_id
    """,
    "CDC-retraction view maintenance, driver-proved end-to-end: the "
    "reference's rewards report (sql/queries.sql:24-33) over a stream "
    "with INSERT + MODIFY + REMOVE (sql/incremental_sync_member_quests"
    ".sql:42-52), MAINTAINED instead of recomputed. A deterministic "
    "member_quest CDC fixture derived from the events table runs the "
    "REAL pipeline across two AvailableNow refreshes; a retractable "
    "IncrementalAggTable (count support + invertible sum) is fed the "
    "merge's own before/after images (cdc_delta: old target rows of "
    "staged keys at -1, new non-REMOVE images at +1) BEFORE each target "
    "commit. The oracle re-derives the from-scratch GROUP BY over the "
    "final target analytically: MODIFY nets to (new-old), REMOVE "
    "subtracts, emptied member groups disappear, untouched bootstrap "
    "rows survive. Dollars are exact binary quarters so maintained "
    "double sums are bit-identical to one-shot sums. min/max stay "
    "append-only scope by construction (non-invertible; the table "
    "refuses them in delta mode).",
)
def incremental_mv_rewards_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _rewards_cdc_fixture(spark, sf_dir)["mv"]
    schema = T.StructType(
        [
            T.StructField("member_id", T.StringType()),
            T.StructField("n_quests", T.LongType()),
            T.StructField("total_dollars", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema).orderBy("member_id")


@register(
    "mv_rewards_freshness",
    """
    WITH e AS (
      SELECT event_id, CAST(event_id % 97 AS INTEGER) AS kid,
             CASE WHEN event_id < 500 THEN 0 ELSE 1 END AS wave
      FROM events
    ),
    l1 AS (SELECT kid, MAX(event_id) AS last_id FROM e WHERE wave = 0
           GROUP BY kid),
    l2 AS (SELECT kid, MAX(event_id) AS last_id FROM e WHERE wave = 1
           GROUP BY kid),
    after1 AS (
      SELECT kid FROM l1 WHERE last_id % 11 <> 0
      UNION
      SELECT k AS kid FROM generate_series(0, 19) AS t(k)
      WHERE k NOT IN (SELECT kid FROM l1)
    ),
    b0 AS (
      SELECT CAST(0 AS INTEGER) AS batch_id,
             TIMESTAMP '2024-01-01 00:00:00' AS watermark,
             CAST((SELECT COUNT(*) FROM l1 WHERE kid <= 19)
                + (SELECT COUNT(*) FROM l1 WHERE last_id % 11 <> 0)
                AS BIGINT) AS staged_count,
             CAST((SELECT COUNT(*) FROM l1 WHERE kid <= 19) AS BIGINT)
               AS deleted_count,
             CAST((SELECT COUNT(*) FROM l1 WHERE last_id % 11 <> 0)
               AS BIGINT) AS inserted_count
    ),
    b1 AS (
      SELECT CAST(1 AS INTEGER) AS batch_id,
             TIMESTAMP '2024-01-01 00:00:00'
               + ((SELECT MAX(event_id) FROM e WHERE wave = 0) + 1)
                 * INTERVAL 1 SECOND AS watermark,
             CAST((SELECT COUNT(*) FROM l2
                   WHERE kid IN (SELECT kid FROM after1))
                + (SELECT COUNT(*) FROM l2 WHERE last_id % 11 <> 0)
                AS BIGINT) AS staged_count,
             CAST((SELECT COUNT(*) FROM l2
                   WHERE kid IN (SELECT kid FROM after1)) AS BIGINT)
               AS deleted_count,
             CAST((SELECT COUNT(*) FROM l2 WHERE last_id % 11 <> 0)
               AS BIGINT) AS inserted_count
    )
    SELECT * FROM b0 UNION ALL SELECT * FROM b1 ORDER BY batch_id
    """,
    "Maintained-view freshness in the sync log (the reference's lag "
    "monitors, sql/queries.sql:1-19, extended to cover maintained "
    "reports): each micro-batch the pipeline stamps one 'mv:rewards' "
    "row with the watermark the view's delta was staged against and the "
    "delta decomposition (retractions vs upserts, observed on the state "
    "write itself — zero extra jobs). The oracle re-derives both "
    "batches' rows analytically from the events table: batch 0 stages "
    "against the initial-load watermark and retracts exactly the "
    "bootstrap keys the stream touches; batch 1 stages against wave 1's "
    "max event time and retracts the keys wave 1 left in the target.",
)
def mv_rewards_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _rewards_cdc_fixture(spark, sf_dir)["freshness"]
    schema = T.StructType(
        [
            T.StructField("batch_id", T.IntegerType()),
            T.StructField("watermark", T.TimestampType()),
            T.StructField("staged_count", T.LongType()),
            T.StructField("deleted_count", T.LongType()),
            T.StructField("inserted_count", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema).orderBy("batch_id")


# Registration complete for this module — trigger the driver-window reorder
# (no-op until the LAST registering module finishes; see inventory.py).
from .inventory import _maybe_reorder_registry  # noqa: E402

_maybe_reorder_registry()
