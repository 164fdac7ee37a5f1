"""Round-18 oracle candidate, STAGED — implemented and DuckDB-proven in
round 12, registered when a window slot opens (COVERAGE.md slot plan:
r13 uniform_sample_by_source, r14 doc_uniqueness_profile, r15
source_content_overlap, r16 corpus_version_diff, r17
corpus_diff_by_source — each needing a retirement or landing rows-only;
this candidate is next after them, giving the LAST no-driver-row
family with a planned SQL path its driver form).

- ``boilerplate_pruned_docs`` — group-scoped boilerplate pruning
  (operators/boilerplate.prune_frequent_segments) over the documents
  table in word mode (delimiter ``' '`` — corpus-adaptive frequent-word
  pruning, the configuration the operator's real-documents pytest pin
  already exercises): for every doc, ``(doc_id, n_segments,
  n_segments_kept, clean_text)`` after removing every word that appears
  in more than 3/4 of its source's documents (``min_docs=2``,
  ``max_doc_ratio=0.75`` — chosen so the synthetic corpus shows BOTH
  behaviors: most docs pruned-but-kept, a few fully emptied, exercising
  the emptied-doc contract on the driver surface). The oracle is the verbatim semantic statement
  (split/unnest with subscripts -> per-(source, word) distinct-doc
  frequency -> strict-ratio drop set -> NOT EXISTS prune -> ordered
  string_agg reassembly). Zero float surface in the OUTPUT (strings +
  bigints); the one float in the PREDICATE (0.75 * n_docs) is exact in
  IEEE (0.75 = 3/4 is exactly representable, and 0.75 * n_docs is exact
  for any integer n_docs < 2^51), so no boundary can flip a row between
  engines. A green hash row proves the two-shuffle docfreq +
  LEFT-ANTI + ordered-reassembly machinery IS the semantic definition
  row-exactly, including the emptied-doc contract (all words pruned ->
  clean_text = '').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.boilerplate import prune_frequent_segments
from ..sources.tables import load_table

MIN_DOCS = 2
MAX_DOC_RATIO = 0.75


def boilerplate_pruned_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(doc_id, n_segments, n_segments_kept, clean_text)`` — the
    documents table with source-frequent words removed from every doc,
    ordered by id."""
    docs = load_table(spark, sf_dir, "documents")
    return prune_frequent_segments(
        docs,
        text_col="text",
        id_col="doc_id",
        group_cols=("source",),
        delimiter=" ",
        min_docs=MIN_DOCS,
        max_doc_ratio=MAX_DOC_RATIO,
    ).orderBy("doc_id")


_ORACLE = f"""
WITH base AS (
  SELECT doc_id, source, string_split(coalesce(text, ''), ' ') AS l
  FROM documents),
totals AS (SELECT doc_id, source, len(l) AS n_segments FROM base),
pos AS (
  SELECT doc_id, source,
         unnest(l) AS segment,
         generate_subscripts(l, 1) AS seg_idx
  FROM base),
docfreq AS (
  SELECT source, segment, count(DISTINCT doc_id) AS dfd
  FROM pos GROUP BY source, segment),
nd AS (SELECT source, count(*) AS n_docs FROM totals GROUP BY source),
drop_set AS (
  SELECT f.source, f.segment
  FROM docfreq f JOIN nd n ON f.source IS NOT DISTINCT FROM n.source
  WHERE f.dfd >= {MIN_DOCS} AND f.dfd > {MAX_DOC_RATIO} * n.n_docs),
kept AS (
  SELECT p.doc_id, p.seg_idx, p.segment
  FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM drop_set d
    WHERE d.source IS NOT DISTINCT FROM p.source
      AND d.segment = p.segment)),
reassembled AS (
  SELECT doc_id,
         count(*) AS n_segments_kept,
         string_agg(segment, ' ' ORDER BY seg_idx) AS clean_text
  FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       CAST(t.n_segments AS BIGINT) AS n_segments,
       CAST(coalesce(r.n_segments_kept, 0) AS BIGINT) AS n_segments_kept,
       coalesce(r.clean_text, '') AS clean_text
FROM totals t LEFT JOIN reassembled r USING (doc_id)
ORDER BY t.doc_id
"""

# name -> (query fn, oracle SQL) — what the next open slot registers.
STAGED_R18: dict = {
    "boilerplate_pruned_docs": (boilerplate_pruned_docs, _ORACLE),
}
