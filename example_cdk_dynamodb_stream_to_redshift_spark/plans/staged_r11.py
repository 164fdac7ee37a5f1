"""Round-11 oracle candidate, STAGED — implemented and DuckDB-proven
this round, registered when a window slot opens.

Capacity arithmetic (COVERAGE.md): the oracle ceiling is 150 (50-slot
window x 3-round staleness); round 10 promotes the two STAGED_R10
queries and lands at 149, so round 11 has EXACTLY ONE spare slot. This
file stages that slot's candidate the same way staged_r10.py staged
round 10's: nothing here imports ``inventory.register`` — promotion is
a mechanical ``@register(name, ORACLE_SQL[name], ...)`` in
plans/inventory_pipeline.py plus a window add.

- ``token_budget_corpus`` — the data-constrained-training selector
  (operators/selection.py): keep the highest-quality documents until a
  7,000-token budget is exhausted. The SPARK side runs the scale path
  (``budget_select``: ONE lazy query — bounded-key histogram -> one-row
  broadcast boundary frame -> pure filter for full buckets + a window
  over ONLY the boundary bucket; no collect, no driver-side walk);
  the DuckDB side restates the semantic definition verbatim (one global
  window cumsum, keep while cum <= budget). A green hash row therefore
  proves the two-pass threshold algorithm IS the naive global sort,
  row-exactly — the same "oracle states semantics, implementation is
  scale-smart" shape as user_reach_kmv_sketch. Quality is the proven
  IEEE-double scoring chain of doc_quality_scores (hash-green since
  r6); the weight is the integer whitespace token count, so the
  cumulative sum is exact and order-independent across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.selection import budget_select, uniform_edges
from ..sources.tables import load_table

# Shared stopword IN-list fragment from functions/text.py — NOT imported
# from inventory_ml (that would be circular: inventory_pipeline, imported
# during inventory_ml's own registration chain, imports this module to
# register the promotion, so a direct `import plans.inventory_ml` entry
# point would hit the partially-initialized module).
_STOP_SQL = TX.STOP_SQL

# Frozen selection parameters — declared, like drift's bucket edges.
_BUDGET_TOKENS = 7_000
_EDGES = uniform_edges(32)  # quality is in [0,1] by construction


def token_budget_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest-quality prefix of the corpus under a 7k-token budget,
    selected by the two-pass scale path. Output (doc_id, quality,
    n_tokens) ordered by the selection order itself."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        TX.quality_score("text").alias("quality"),
        TX.token_count("text").cast("long").alias("n_tokens"),
    )
    kept = budget_select(
        scored, "quality", "n_tokens", _BUDGET_TOKENS, "doc_id", _EDGES
    )
    return kept.orderBy(F.desc("quality"), F.asc("doc_id"))


def _token_budget_sql() -> str:
    """DuckDB restatement: the semantic definition (global window
    cumsum) over the same scoring chain as doc_quality_scores'
    _QUALITY_CTE, extended with the integer token count."""
    return f"""
    WITH t AS (
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
        CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOP_SQL}))) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sr,
        CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS pc
      -- the Spark side's eligibility filter, restated: a NULL-text doc
      -- has NULL quality AND NULL n_tokens, so without this filter it
      -- would sort last yet pass cum <= budget (SUM skips its NULL
      -- weight) while budget_select excludes it (r9 review finding)
      FROM documents WHERE text IS NOT NULL),
    scored AS (
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        least(n / 100.0, 1.0) * 0.4
        + greatest(1.0 - abs(sr - 0.04) * 5.0, 0.0) * 0.4
        + (1.0 - least(pc / n, 1.0)) * 0.2 AS quality
      FROM t)
    SELECT doc_id, quality, n_tokens FROM (
      SELECT doc_id, quality, n_tokens,
             SUM(n_tokens) OVER (
               ORDER BY quality DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM scored)
    WHERE cum <= {_BUDGET_TOKENS}
    ORDER BY quality DESC, doc_id
    """


# name -> (query fn, oracle SQL) — what the next open slot registers.
STAGED_R11: dict = {
    "token_budget_corpus": (token_budget_corpus, _token_budget_sql()),
}
