"""Round-14 driver candidate, STAGED — the driver path for the shingle
rarity family (operators/rarity.py), implemented and DuckDB-proven in
round 10, registered no earlier than round 14. Nothing here imports
``inventory.register``.

Slot arithmetic (COVERAGE.md slot plan): rounds 11-13 are spoken for
(token_budget_corpus, the heavy-hitter recount + retirement, one of
the two staged sampling twins). Round 14's slot source is whichever
r12/r13 option was NOT taken — the recount landing rows-only leaves
permanent 1-per-3-rounds slack; otherwise another retirement under the
replace-in-place rule. Decide at the r13 verdict; the (fn, oracle)
pair ships here either way, foreign-CWD proven this round.

Why this is a first-rank oracle candidate: the oracle is the VERBATIM
semantic statement — distinct per-doc md5 shingles, document
frequencies, count those with df = 1 — with an integer-only output
(counts, no ratio), so a green hash row proves the exchange-reused
two-consumer plan IS the definition with zero float surface. Same
md5-equality footing as the green ngram_decontamination rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rarity import uniqueness_profile
from ..sources.tables import load_table

RARITY_N = 8


def _ngram_sql(n: int) -> str:
    terms = " || ' ' || ".join(f"l[i + {k}]" for k in range(1, n + 1))
    return f"unnest(list_transform(range(len(l) - {n - 1}), i -> {terms}))"


def doc_uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(doc_id, n_shingles, n_unique)`` — every document's distinct
    word-8-gram count and how many of those 8-grams appear in no other
    document: the corpus-uniqueness triage signal (near-dups and
    template pages score low) from operators/rarity.uniqueness_profile.
    """
    docs = load_table(spark, sf_dir, "documents")
    return uniqueness_profile(docs, "text", "doc_id", RARITY_N).orderBy(
        "doc_id"
    )


UNIQUENESS_ORACLE_SQL = f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    sh AS (SELECT DISTINCT doc_id, md5({_ngram_sql(RARITY_N)}) AS g FROM t),
    freq AS (SELECT g, COUNT(*) AS df FROM sh GROUP BY g),
    prof AS (
      SELECT doc_id, COUNT(*) AS n_shingles,
             COUNT(*) FILTER (WHERE df = 1) AS n_unique
      FROM sh JOIN freq USING (g) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(n_shingles, 0) AS n_shingles,
           COALESCE(n_unique, 0) AS n_unique
    FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id IS NOT NULL) d
    LEFT JOIN prof ON d.doc_id = prof.doc_id
    ORDER BY 1
"""

STAGED_R14 = {
    "doc_uniqueness_profile": (doc_uniqueness_profile, UNIQUENESS_ORACLE_SQL),
}
