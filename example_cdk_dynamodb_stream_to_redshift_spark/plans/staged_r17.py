"""Round-17 oracle candidate, STAGED — implemented and DuckDB-proven in
round 12, registered when a window slot opens (COVERAGE.md slot plan:
r13 uniform_sample_by_source; r14 doc_uniqueness_profile; r15
source_content_overlap; r16 corpus_version_diff — each needing a
retirement or landing rows-only; this candidate is next after them).

- ``corpus_diff_by_source`` — the GROUPED corpus snapshot diff
  (operators/corpus_diff.diff_by_group): ``(source, status, n_docs)``
  — "which sources drove the adds/removes/changes between two corpus
  versions", the attribution question a 100 TB corpus owner actually
  asks of a new snapshot before re-paying dedup/quality/mixture. The
  r11-verdict item-6 decision (COVERAGE.md, round 12) keeps the r16
  slot on the stronger-hash-surface per-document form and stages this
  rollup as its own candidate rather than replacing it.

  Versions are the same deterministic mutations as staged_r16 (old =
  doc_id % 3 != 0; new = doc_id % 5 != 0 with text rewritten where
  doc_id % 7 == 0), so the oracle is the pure semantic statement:
  per-side GROUP BY doc_id with count + min/max fingerprint envelope +
  NULL-presence flag + max(source) label, FULL OUTER JOIN, status CASE,
  new-side group attribution (old side only for removed docs), rollup
  count. Zero float surface (string group, string status, bigint
  count). A green hash row proves the shared diff machinery AND the
  attribution rule row-exactly; the per-document twin covers
  multiplicities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus_diff import diff_by_group
from ..sources.tables import load_table


def _old(docs: DataFrame) -> DataFrame:
    return docs.filter((F.col("doc_id") % 3) != 0).select(
        "doc_id", "text", "source"
    )


def _new(docs: DataFrame) -> DataFrame:
    return docs.filter((F.col("doc_id") % 5) != 0).select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 7) == 0,
            F.concat(F.lit("rewritten "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    )


def corpus_diff_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(source, status, n_docs)`` — per-source attribution of the diff
    between two deterministic versions of the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return diff_by_group(_old(docs), _new(docs))


_ORACLE = """
WITH old_side AS (
  SELECT doc_id, count(*) AS n_old,
         min(md5(lower(trim(text)))) AS fmin,
         max(md5(lower(trim(text)))) AS fmax,
         count(*) > count(md5(lower(trim(text)))) AS hasnull,
         max(source) AS g
  FROM documents
  WHERE doc_id % 3 <> 0 AND doc_id IS NOT NULL GROUP BY doc_id),
new_side AS (
  SELECT doc_id, count(*) AS n_new,
         min(md5(lower(trim(t)))) AS fmin,
         max(md5(lower(trim(t)))) AS fmax,
         count(*) > count(md5(lower(trim(t)))) AS hasnull,
         max(source) AS g
  FROM (SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 0
                    THEN 'rewritten ' || CAST(doc_id AS VARCHAR)
                    ELSE text END AS t
        FROM documents WHERE doc_id % 5 <> 0)
  WHERE doc_id IS NOT NULL GROUP BY doc_id)
SELECT CASE WHEN n.doc_id IS NOT NULL THEN n.g ELSE o.g END AS source,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.fmin IS NOT DISTINCT FROM n.fmin
             AND o.fmax IS NOT DISTINCT FROM n.fmax
             AND o.hasnull = n.hasnull
            THEN 'unchanged' ELSE 'changed' END AS status,
       count(*) AS n_docs
FROM old_side o FULL OUTER JOIN new_side n USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""

# name -> (query fn, oracle SQL) — what the next open slot registers.
STAGED_R17: dict = {
    "corpus_diff_by_source": (corpus_diff_by_source, _ORACLE),
}
