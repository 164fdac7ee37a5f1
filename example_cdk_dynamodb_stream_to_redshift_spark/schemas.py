"""Typed schemas for every dataset shape in the reference pipeline.

The reference keeps these shapes dynamic (Redshift SUPER, schema-on-read); we
declare them as StructTypes so Catalyst can prune/pushdown and so the CDC
parse is a single vectorized ``from_json``.

Reference parity (file:line into /root/reference):
- CDC envelope fields: scripts/setup_redshift.sh:90-104,
  sql/create_materialized_view.sql:18-32.
- DynamoDB export item (attribute-value map): sql/create_dynamo_export_table.sql:3-5,
  sql/initial_load_member_quests.sql:3-6.
- Target tables: sql/create_target_tables.sql:5-37.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# DynamoDB attribute-value wrappers: {"S": "..."} / {"N": "12.34"}.
# Numbers are strings on the wire (lib/lambda/index.ts:85-95).
# --------------------------------------------------------------------------
AV_S = T.StructType([T.StructField("S", T.StringType())])
AV_N = T.StructType([T.StructField("N", T.StringType())])

# Union of the attributes any of the three entities carries
# (lib/lambda/models/index.ts:1-16, FIXTURES.md §2).
ITEM_SCHEMA = T.StructType(
    [
        T.StructField("pk", AV_S),
        T.StructField("sk", AV_S),
        T.StructField("memberId", AV_S),
        T.StructField("memberName", AV_S),
        T.StructField("questId", AV_S),
        T.StructField("dollarsEarned", AV_N),
    ]
)

# The `dynamodb` sub-document of a stream event (parsed to SUPER `eventData`
# in the reference, scripts/setup_redshift.sh:103). ApproximateCreationDateTime
# is epoch MILLISECONDS (sql/incremental_sync_members.sql:28).
DYNAMODB_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ApproximateCreationDateTime", T.LongType()),
        T.StructField(
            "Keys",
            T.StructType([T.StructField("pk", AV_S), T.StructField("sk", AV_S)]),
        ),
        T.StructField("NewImage", ITEM_SCHEMA),  # absent for REMOVE
        T.StructField("OldImage", ITEM_SCHEMA),
    ]
)

# Full CDC envelope as delivered on the Kinesis stream (FIXTURES.md §1).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("eventID", T.StringType()),
        T.StructField("awsRegion", T.StringType()),
        T.StructField("eventName", T.StringType()),  # INSERT | MODIFY | REMOVE
        T.StructField("userIdentity", T.StringType()),
        T.StructField("tableName", T.StringType()),
        T.StructField("eventSource", T.StringType()),
        T.StructField("dynamodb", DYNAMODB_EVENT_SCHEMA),
    ]
)

# Raw stream record: Kinesis transport metadata + payload bytes
# (scripts/setup_redshift.sh:91-95: approximate_arrival_timestamp,
# partition_key, shard_id, sequence_number, kinesis_data VARBYTE).
KINESIS_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("approximate_arrival_timestamp", T.TimestampType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("shard_id", T.StringType()),
        T.StructField("sequence_number", T.StringType()),
        T.StructField("kinesis_data", T.BinaryType()),
    ]
)

# Export file line: {"Item": {...attribute-value map...}}
# (scripts/export_dynamodb_backup.sh:64-70 DYNAMODB_JSON format).
EXPORT_LINE_SCHEMA = T.StructType([T.StructField("Item", ITEM_SCHEMA)])

# --------------------------------------------------------------------------
# Target relational tables (sql/create_target_tables.sql:5-37).
# VARCHAR -> string, FLOAT -> double, TIMESTAMP -> timestamp.
# --------------------------------------------------------------------------
MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("memberId", T.StringType()),
        T.StructField("memberName", T.StringType()),
        T.StructField("approximateUpdateTimestamp", T.TimestampType()),
        T.StructField("eventName", T.StringType()),
        T.StructField("syncTimestamp", T.TimestampType()),
    ]
)

QUEST_SCHEMA = T.StructType(
    [
        T.StructField("questId", T.StringType()),
        T.StructField("questName", T.StringType()),
        T.StructField("approximateUpdateTimestamp", T.TimestampType()),
        T.StructField("eventName", T.StringType()),
        T.StructField("syncTimestamp", T.TimestampType()),
    ]
)

MEMBER_QUEST_SCHEMA = T.StructType(
    [
        T.StructField("memberQuestId", T.StringType()),
        T.StructField("memberId", T.StringType()),
        T.StructField("questId", T.StringType()),
        T.StructField("dollarsEarned", T.DoubleType()),
        T.StructField("approximateUpdateTimestamp", T.TimestampType()),
        T.StructField("eventName", T.StringType()),
        T.StructField("syncTimestamp", T.TimestampType()),
    ]
)

TARGET_SCHEMAS = {
    "member": MEMBER_SCHEMA,
    "quest": QUEST_SCHEMA,
    "member_quest": MEMBER_QUEST_SCHEMA,
}

# Driver-provided analytics tables (/root/testdata/sf*/; TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
