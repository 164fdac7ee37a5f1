"""PySpark-native analytics engine with the capabilities of
damc-dev/example-cdk-dynamodb-stream-to-redshift.

The reference is a CDC analytics pipeline: DynamoDB table changes flow over a
Kinesis stream into Redshift (streaming materialized view), are merged
incrementally into relational target tables by stored procedures, and are
queried with SQL analytics. This package re-expresses that whole surface
Spark-first:

- ``schemas``    -- typed StructTypes for the CDC envelope, DynamoDB export
                    items, and the relational target tables.
- ``sources``    -- readers for DynamoDB-export JSON, CDC envelope JSON
                    (batch + streaming), and the driver's parquet tables.
- ``functions``  -- scalar helpers (attribute-value decoding, epoch-ms
                    timestamps, prefix stripping, text analysis, vector math).
- ``plans``      -- the MV-equivalent extract, initial load, and analytics
                    queries (reference parity + the SURVEY §2 inventory).
- ``operators``  -- CDC merge, dedup family, similarity search, multimodal.
- ``streaming``  -- Structured Streaming pipeline (readStream -> foreachBatch
                    merge) mirroring REFRESH MATERIALIZED VIEW + CALL sync.
"""

__version__ = "0.1.0"
