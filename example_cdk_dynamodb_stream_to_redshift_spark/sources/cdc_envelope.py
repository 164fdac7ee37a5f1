"""CDC envelope source: DynamoDB stream events over a Kinesis-shaped record.

The reference scans the Kinesis stream through a Redshift external schema
(scripts/setup_redshift.sh:79-104): each record is transport metadata +
``kinesis_data`` VARBYTE holding the JSON envelope. We model the same record
shape (schemas.KINESIS_RECORD_SCHEMA) and read it from JSON-lines files, in
both batch and Structured Streaming form — on a real deployment the
``spark.readStream.format("kinesis")`` (or kafka) source yields the identical
columns, so everything downstream is source-agnostic.

File-line shape (produced by our fixture generator, FIXTURES.md §1): one JSON
object per line with the four metadata fields plus ``kinesis_data`` as a
STRING (the envelope JSON itself); we cast to binary to mirror VARBYTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# On-disk fixture line schema: kinesis_data as string (JSON-in-JSON).
_FILE_SCHEMA = T.StructType(
    [
        T.StructField("approximate_arrival_timestamp", T.TimestampType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("shard_id", T.StringType()),
        T.StructField("sequence_number", T.StringType()),
        T.StructField("kinesis_data", T.StringType()),
    ]
)


def _to_record_shape(df: DataFrame) -> DataFrame:
    # VARBYTE parity: payload travels as bytes, decoded by the extract stage
    # with from_varbyte(...,'utf-8') (scripts/setup_redshift.sh:95).
    return df.withColumn("kinesis_data", F.encode("kinesis_data", "UTF-8"))


def read_cdc_records(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of CDC records (KINESIS_RECORD_SCHEMA shape)."""
    return _to_record_shape(
        spark.read.schema(_FILE_SCHEMA).option("mode", "PERMISSIVE").json(path)
    )


def read_cdc_record_stream(spark: SparkSession, path: str) -> DataFrame:
    """Structured Streaming read of the same records (file source).

    ``maxFilesPerTrigger`` is left default; the pipeline uses
    ``Trigger.AvailableNow`` so each "REFRESH" processes everything new, in
    parity with REFRESH MATERIALIZED VIEW (scripts/setup_redshift.sh:123-131).
    """
    return _to_record_shape(
        spark.readStream.schema(_FILE_SCHEMA).option("mode", "PERMISSIVE").json(path)
    )
