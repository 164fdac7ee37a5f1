"""Round-12 driver candidate, STAGED — the two-phase heavy-hitter
recount over the real document token stream, implemented and
DuckDB-proven in round 10, registered no earlier than round 12.

Slot arithmetic (COVERAGE.md "Slot plan through round 12"): after round
11 promotes ``token_budget_corpus`` the oracle-bearing population is
150 = the exact 50-slot x 3-round rotation ceiling, and every round
from 12 on owes exactly its 50-entry cohort — ZERO spare slots. So this
candidate can only land by freeing one: round 12 retires
``order_price_quartiles`` (a strict subset of
``order_price_percentiles``) and registers ``heavy_hitter_recount`` in
the freed slot. Nothing here imports ``inventory.register``.

The staged query is the production two-phase shape of
``operators/heavyhitters.py``: the corpus is sliced into
``N_SLICES`` deterministic batches (``doc_id % N_SLICES``, the
micro-batch stand-in), each batch summarized by its exact top-``K``
counts plus its exact truncation threshold, and ``exact_recount`` then
takes candidates from the merged kilobyte summaries and pays ONE
broadcast-semi-join scan of the corpus for exact counts.

The oracle is the pure SEMANTIC statement, not an algorithm
restatement: ``MIN_COUNT`` is chosen ABOVE the summed truncation
thresholds on this data (measured: sum_thresh 886 at sf0.001, 858 at
sf0.01, vs MIN_COUNT 900; K=24 of the 31-token vocabulary, so every
slice genuinely truncates), which puts the query in the
no-false-negative regime — the two-phase result provably EQUALS a
plain ``GROUP BY key HAVING count(*) >= MIN_COUNT``. A green hash row
therefore proves the summarize->merge->recount machinery IS the exact
global aggregate, the same "oracle states semantics, implementation is
scale-smart" shape as ``token_budget_corpus`` and
``user_reach_kmv_sketch``. (The margin is a property of the committed
test parquet; tests/test_staged_r12.py re-derives it, so data drift
fails loudly, not as a silent red driver row.)

Registration options for round 12, in COVERAGE.md's preference order:
rows-only (oracle=None — preserves the 149-population slack the
retirement buys); or with ``ORACLE_SQL`` below (spends the slack to
return to a saturated 150, but earns a hash row — choose deliberately).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.heavyhitters import batch_summary, exact_recount
from ..sources.tables import load_table

N_SLICES = 4
K = 24           # truncating: vocabulary is 31 tokens per slice
MIN_COUNT = 900  # > summed thresholds at both test SFs (886 / 858)


def heavy_hitter_recount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(key, cnt)`` — exact counts of every token whose corpus total
    reaches MIN_COUNT, computed the 100 TB way: per-slice truncated
    summaries (each bounded by slice vocabulary), candidates from the
    merged kilobyte store, ONE broadcast-semi-join recount scan. In the
    no-false-negative regime (MIN_COUNT above the summed truncation
    thresholds) this equals the exact global GROUP BY, which is what
    the oracle states."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % N_SLICES).cast("int").alias("b"),
        F.explode(TX.tokens("text")).alias("token"),
    )
    # The four slice summaries are independent and each runs an EAGER
    # localCheckpoint job; submit them from a thread pool so the jobs
    # overlap instead of serializing their scheduling gaps (guide-§2.6
    # back-fill — the same recipe as CdcPipeline's concurrent entity
    # merges). Results are collected in slice order, so the summary
    # union is deterministic and byte-identical to the sequential form.
    from concurrent.futures import ThreadPoolExecutor

    def one_slice(i: int) -> DataFrame:
        return batch_summary(
            tok.filter(F.col("b") == i).select("token"), "token", K
        ).withColumn("batch_id", F.lit(i))

    with ThreadPoolExecutor(max_workers=N_SLICES) as pool:
        parts = list(pool.map(one_slice, range(N_SLICES)))
    summ = reduce(DataFrame.unionByName, parts)
    return exact_recount(tok, summ, "token", MIN_COUNT)


ORACLE_SQL = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS key
             FROM documents)
SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt
FROM tok
GROUP BY key
HAVING COUNT(*) >= {MIN_COUNT}
ORDER BY cnt DESC, key
"""

# name -> (query fn, semantic oracle) — what round 12 MAY register
# (rows-only registration passes oracle=None instead; see module doc).
STAGED_R12: dict = {
    "heavy_hitter_recount": (heavy_hitter_recount, ORACLE_SQL),
}
