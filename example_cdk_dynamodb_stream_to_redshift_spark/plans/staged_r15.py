"""Round-15 driver candidate, STAGED — the driver path for the
cross-source overlap matrix (operators/rarity.source_overlap,
min-shingle mode), implemented and DuckDB-proven in round 10,
registered no earlier than round 15. Nothing here imports
``inventory.register``.

Slot arithmetic (COVERAGE.md slot plan): rounds 11-14 are spoken for
(token_budget_corpus; recount + retirement; one sampling twin;
doc_uniqueness_profile). Round 15's slot source follows the same
retire-or-slack ladder; the (fn, oracle) pair ships here either way.

Why this is a first-rank oracle candidate: the min-shingle fingerprint
is one md5-min over word-8-grams — DuckDB restates it verbatim
(``list_aggregate(list_transform(range(...), i -> md5(...)), 'min')``
equals Spark's ``array_min``/``transform`` on identical strings), the
output is (string, string, count) with zero float surface, and the
corpus carries genuine signal at both proof scales (23 pairs at
sf0.001, 19 at sf0.01 — neither empty nor total). The exact-fingerprint
mode is deliberately NOT the candidate: the synthetic corpus has zero
cross-source exact duplicates, so its green row would be vacuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.rarity import source_overlap
from ..sources.tables import load_table

OVERLAP_N = 8


def _ngram_sql(n: int) -> str:
    terms = " || ' ' || ".join(f"l[i + {k}]" for k in range(1, n + 1))
    return f"list_transform(range(len(l) - {n - 1}), i -> md5({terms}))"


def source_content_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(source_a, source_b, n_shared)`` — how many min-shingle
    fingerprints each unordered source pair shares: the acquisition-time
    "is corpus B already inside A" diagnostic, from
    operators/rarity.source_overlap in min-shingle (near-dup-leaning)
    mode. ``max_sources`` is the opt-in mis-passed-column guard: the
    documents table's true source cardinality is single-digit, so 256
    never fires on contract-conforming data while still killing the
    quadratic blowup if the group column were ever mis-wired."""
    docs = load_table(spark, sf_dir, "documents")
    return source_overlap(
        docs, "text", "source", shingle_n=OVERLAP_N, max_sources=256
    )


OVERLAP_ORACLE_SQL = f"""
    WITH t AS (SELECT source, string_split(text, ' ') AS l
               FROM documents WHERE source IS NOT NULL),
    fps AS (SELECT DISTINCT
              list_aggregate({_ngram_sql(OVERLAP_N)}, 'min') AS fp,
              CAST(source AS VARCHAR) AS g
            FROM t WHERE fp IS NOT NULL)
    SELECT a.g AS source_a, b.g AS source_b, COUNT(*) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.g < b.g
    GROUP BY 1, 2 ORDER BY 1, 2
"""

STAGED_R15 = {
    "source_content_overlap": (source_content_overlap, OVERLAP_ORACLE_SQL),
}
