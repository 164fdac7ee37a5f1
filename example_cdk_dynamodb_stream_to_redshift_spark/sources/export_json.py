"""Reader for DynamoDB point-in-time exports (DYNAMODB_JSON, gzip).

Reference parity: the S3 ``COPY ... FORMAT JSON 'auto ignorecase' gzip
ACCEPTINVCHARS TRUNCATECOLUMNS TRIMBLANKS`` load into ``dump_table (Item
SUPER)`` (scripts/initial_load_from_export.sh:161-171,
sql/create_dynamo_export_table.sql:3-5).

Spark mapping:
- gzip JSON lines        -> spark.read.json (codec inferred from .gz extension)
- 'auto ignorecase'      -> Spark's analyzer resolves JSON fields against the
                            supplied schema case-insensitively by default
                            (spark.sql.caseSensitive=false)
- ACCEPTINVCHARS         -> mode=PERMISSIVE (malformed rows -> nulls, never fail)
- TRIMBLANKS             -> optional rtrim normalization pass
- SUPER column           -> typed StructType (schemas.EXPORT_LINE_SCHEMA); the
                            dotted-path navigation `item.pk."S"` becomes struct
                            field access `F.col("Item.pk.S")`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EXPORT_LINE_SCHEMA


def read_dynamodb_export(
    spark: SparkSession, path: str, trim_blanks: bool = False
) -> DataFrame:
    """Read an export (one JSON object per line, optionally gzip) into a
    DataFrame with a single ``Item`` struct column, mirroring ``dump_table``.
    """
    df = spark.read.schema(EXPORT_LINE_SCHEMA).option("mode", "PERMISSIVE").json(path)
    if trim_blanks:
        # TRIMBLANKS: strip trailing blanks from every string attribute.
        df = df.select(
            F.struct(
                *[
                    _rtrim_av(field)
                    for field in EXPORT_LINE_SCHEMA["Item"].dataType.fieldNames()
                ]
            ).alias("Item")
        )
    return df


def _rtrim_av(attr: str):
    sub = "N" if attr == "dollarsEarned" else "S"
    return F.struct(F.rtrim(F.col(f"Item.{attr}.{sub}")).alias(sub)).alias(attr)
