"""Round-16 oracle candidate, STAGED — implemented and DuckDB-proven in
round 11, registered when a window slot opens (COVERAGE.md slot plan:
r12 retires order_price_quartiles and lands heavy_hitter_recount
rows-only; r13 uniform_sample_by_source; r14 doc_uniqueness_profile;
r15 source_content_overlap — each of r14/r15 needs a retirement or
lands rows-only, and this candidate is next in line after them).

- ``corpus_version_diff`` — the corpus snapshot diff
  (operators/corpus_diff.py): per-document added / removed / changed /
  unchanged accounting between two corpus versions, with per-side
  multiplicities. The two versions are deterministic mutations of the
  documents table both engines restate verbatim (old = doc_id % 3 != 0;
  new = doc_id % 5 != 0 with text rewritten where doc_id % 7 == 0 —
  adds arise naturally from ids with % 3 == 0 and % 5 != 0, removals
  from the converse), so the oracle is the pure semantic
  statement: per-side GROUP BY doc_id with count + min/max-fingerprint
  envelope, FULL OUTER JOIN, null-safe envelope compare. Zero float
  surface (string status, bigint counts, md5 fingerprints); a green
  hash row proves the one-aggregation-per-side + equi-join shape IS the
  semantic diff, row-exactly. The maintained twin
  (streaming/manifest_maintenance.SnapshotManifest) is pinned equal to
  this operator after every batch in tests/test_manifest_maintenance.py,
  so the driver row covers the family's semantics; the grouped rollup
  (diff_by_group) is equally SQL-restatable if a second slot ever opens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus_diff import corpus_diff
from ..sources.tables import load_table


def _old(docs: DataFrame) -> DataFrame:
    return docs.filter((F.col("doc_id") % 3) != 0).select("doc_id", "text")


def _new(docs: DataFrame) -> DataFrame:
    return docs.filter((F.col("doc_id") % 5) != 0).select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 7) == 0,
            F.concat(F.lit("rewritten "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def corpus_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document diff between two deterministic versions of the
    documents corpus — (doc_id, status, n_old, n_new) ordered by id."""
    docs = load_table(spark, sf_dir, "documents")
    return corpus_diff(_old(docs), _new(docs)).orderBy("doc_id")


_ORACLE = """
WITH old_side AS (
  SELECT doc_id, count(*) AS n_old,
         min(md5(lower(trim(text)))) AS fmin,
         max(md5(lower(trim(text)))) AS fmax,
         count(*) > count(md5(lower(trim(text)))) AS hasnull
  FROM documents
  WHERE doc_id % 3 <> 0 AND doc_id IS NOT NULL GROUP BY doc_id),
new_side AS (
  SELECT doc_id, count(*) AS n_new,
         min(md5(lower(trim(t)))) AS fmin,
         max(md5(lower(trim(t)))) AS fmax,
         count(*) > count(md5(lower(trim(t)))) AS hasnull
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN 'rewritten ' || CAST(doc_id AS VARCHAR)
                    ELSE text END AS t
        FROM documents WHERE doc_id % 5 <> 0)
  WHERE doc_id IS NOT NULL GROUP BY doc_id)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.fmin IS NOT DISTINCT FROM n.fmin
             AND o.fmax IS NOT DISTINCT FROM n.fmax
             AND o.hasnull = n.hasnull
            THEN 'unchanged' ELSE 'changed' END AS status,
       coalesce(o.n_old, 0) AS n_old,
       coalesce(n.n_new, 0) AS n_new
FROM old_side o FULL OUTER JOIN new_side n USING (doc_id)
ORDER BY doc_id
"""

# name -> (query fn, oracle SQL) — what the next open slot registers.
STAGED_R16: dict = {
    "corpus_version_diff": (corpus_version_diff, _ORACLE),
}
