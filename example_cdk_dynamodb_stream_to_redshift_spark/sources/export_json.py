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
- ACCEPTINVCHARS ' '     -> accept_inv_chars=' ': invalid UTF-8 byte sequences
                            are SUBSTITUTED with the given character and the
                            row is KEPT (Redshift semantics) — the line is
                            decoded leniently (invalid sequences -> U+FFFD by
                            the text source), the replacement char swapped in,
                            then parsed with from_json. Without it, PERMISSIVE
                            json reading nulls the malformed row's fields
                            instead of repairing them.
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
    spark: SparkSession,
    path: str,
    trim_blanks: bool = False,
    accept_inv_chars: str | None = None,
) -> DataFrame:
    """Read an export (one JSON object per line, optionally gzip) into a
    DataFrame with a single ``Item`` struct column, mirroring ``dump_table``.

    ``accept_inv_chars`` reproduces COPY's ``ACCEPTINVCHARS '<c>'``
    (scripts/initial_load_from_export.sh:168): each invalid UTF-8 byte
    sequence in the raw line becomes ``<c>`` and the row loads normally.
    JSON structure bytes are ASCII, so substitution inside string values
    never breaks the parse. (Known narrow divergence: a literal U+FFFD in
    valid input is indistinguishable from the decoder's replacement and is
    substituted too; Redshift passes it through.)
    """
    if accept_inv_chars is not None:
        if len(accept_inv_chars) != 1:
            raise ValueError(
                "accept_inv_chars is a single replacement character "
                f"(COPY ACCEPTINVCHARS contract), got {accept_inv_chars!r}"
            )
        lines = spark.read.text(path)  # lenient decode: bad bytes -> U+FFFD
        df = lines.select(
            F.from_json(
                F.translate(F.col("value"), "�", accept_inv_chars),
                EXPORT_LINE_SCHEMA,
            ).alias("line")
        ).select("line.Item")
    else:
        df = (
            spark.read.schema(EXPORT_LINE_SCHEMA)
            .option("mode", "PERMISSIVE")
            .json(path)
        )
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
