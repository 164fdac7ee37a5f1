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


# Registration complete for this module — trigger the driver-window reorder
# (no-op until the LAST registering module finishes; see inventory.py).
from .inventory import _maybe_reorder_registry  # noqa: E402

_maybe_reorder_registry()
