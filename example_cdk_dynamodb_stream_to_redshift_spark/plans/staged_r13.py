"""Round-13 driver candidates, STAGED — driver paths for the round-10
sampling families (operators/bottomk.py, operators/weighted_sample.py),
implemented and DuckDB-proven in round 10, registered no earlier than
round 13. Nothing here imports ``inventory.register``.

Slot arithmetic (COVERAGE.md slot plan): round 11 promotes
``token_budget_corpus`` (population 150, saturated), round 12 retires
``order_price_quartiles`` and lands ``heavy_hitter_recount`` in the
freed slot. If round 12 registers the recount ROWS-ONLY, the
population sits at 149 with a permanent 1-slot-per-3-rounds slack —
round 13 can spend that slack on ONE of these. If round 12 spends the
slack on the recount's oracle, landing either candidate needs another
retirement (earmark: ``stratified_sample_by_source``'s rand()-free twin
below STRENGTHENS the same surface, making the original the natural
retirement candidate under the replace-in-place rule). Decide at the
r12 verdict; both (fn, oracle) pairs ship here either way.

Why these two are first-rank oracle candidates (COVERAGE.md already
notes it for bottom-k): the oracle is a VERBATIM semantic restatement,
not an algorithm transcription —

- ``uniform_sample_by_source``: the k md5-smallest distinct doc ids per
  source. DuckDB's md5 equals Spark's md5 on identical strings, so the
  oracle is DISTINCT -> md5 -> row_number, all strings, ZERO float
  surface. A green hash row proves the map-side-dedup + bounded-heap
  sample IS the definition.
- ``weighted_doc_sample``: the 50 largest Efraimidis-Spirakis
  priorities ln(u)/w over token-count weights. The priority is float,
  but the OUTPUT schema is not (``(key, w:bigint)``): the float only
  decides the ORDER, and the k-boundary margin on this data is ~3e-2
  relative (re-derived from the parquet in tests/test_staged_r13.py),
  thousands of ulps wider than any Spark-vs-DuckDB libm divergence —
  the established exp()/sigmoid-margin argument from
  ``doc_quality_scored_frozen``. DuckDB reproduces the Python
  reference priorities bit-for-bit (UBIGINT hex parse, checked offline
  in round 10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bottomk import bottomk_keys
from ..operators.weighted_sample import weighted_sample_keys
from ..sources.tables import load_table

K_PER_SOURCE = 6
WS_K = 50
WS_SEED = 0


def uniform_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(source, key, h)`` — the deterministic uniform sample: the
    K_PER_SOURCE md5-smallest distinct doc ids per source (the
    bottom-k sample stratified by source). The rand()-free,
    re-ingestion-stable twin of ``stratified_sample_by_source``."""
    docs = load_table(spark, sf_dir, "documents")
    return bottomk_keys(docs, "doc_id", K_PER_SOURCE, ("source",)).orderBy(
        "source", "h"
    )


UNIFORM_ORACLE_SQL = f"""
    SELECT source, key, h FROM (
      SELECT source, key, md5(key) AS h,
             row_number() OVER (PARTITION BY source ORDER BY md5(key)) AS rn
      FROM (SELECT DISTINCT source, CAST(doc_id AS VARCHAR) AS key
            FROM documents WHERE doc_id IS NOT NULL)
    ) WHERE rn <= {K_PER_SOURCE}
    ORDER BY source, h
"""


def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(key, w)`` — the WS_K docs sampled without replacement with
    probability proportional to token count (E-S priorities over
    ``size(split(text, ' '))``): the sample that reflects the TOKEN
    distribution rather than the doc distribution. The float priority
    only orders; the output is integer-only for driver-hash safety."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    pop = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("double").alias("w")
    )
    return (
        weighted_sample_keys(pop, "doc_id", "w", WS_K, seed=WS_SEED)
        .select("key", F.col("w").cast("bigint").alias("w"))
        .orderBy("key")
    )


WEIGHTED_ORACLE_SQL = f"""
    SELECT key, CAST(w AS BIGINT) AS w FROM (
      SELECT key, w,
             row_number() OVER (
               ORDER BY ln((CAST(CAST('0x' || substr(md5('{WS_SEED}|' || key), 1, 16)
                                 AS UBIGINT) AS DOUBLE) + 0.5)
                           / 18446744073709551616.0) / w DESC,
                        key
             ) AS rn
      FROM (SELECT CAST(doc_id AS VARCHAR) AS key,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS w
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL)
      WHERE w > 0
    ) WHERE rn <= {WS_K}
    ORDER BY key
"""


STAGED_R13: dict = {
    "uniform_sample_by_source": (uniform_sample_by_source, UNIFORM_ORACLE_SQL),
    "weighted_doc_sample": (weighted_doc_sample, WEIGHTED_ORACLE_SQL),
}
