"""Mergeable heavy-hitter summaries with DETERMINISTIC error bounds:
per-slice exact-count top-k truncation whose merge carries explicit
[lower, upper] bounds per key — the maintained counterpart to the
engine's one-shot ``frequent_tokens_sketch`` (freqItems), the way KMV
is the deterministic counterpart to approx_count_distinct.

Why not Misra-Gries/SpaceSaving state machines: their summaries depend
on processing ORDER, so a shuffled re-run yields a different (still
bound-respecting) summary — untestable as equality and irreproducible
across re-ingestions. This design instead summarizes each slice by its
EXACT counts truncated to the top-k (ties broken by key, so the kept
set is a pure function of the slice's multiset), plus the slice's
truncation threshold (the exact maximum dropped count; 0 when nothing
was dropped). Merging summaries is then pure arithmetic over tiny
frames:

- ``lower(key)``  = sum of stored counts — every stored count is exact,
  so the true total is AT LEAST this;
- ``upper(key)``  = lower + sum of thresholds of the slices where the
  key is ABSENT — a key can hide at most ``threshold`` occurrences in a
  slice that dropped it;
- any key whose true total exceeds the SUM of all thresholds is
  guaranteed present in the merged view (no false negatives above the
  global truncation bound — the classic heavy-hitter guarantee).

Scale shape: the per-slice aggregation is bounded by SLICE vocabulary
(one groupBy over the batch, the micro-batch analogue of the corpus
problem it avoids); the stored artifact is k+ rows per slice; every
merged read touches only stored summaries — landed data is never
rescanned. Top-k extraction is ``ORDER BY cnt DESC LIMIT k`` =
TakeOrderedAndProject (bounded per-partition heaps), never a global
sort.

Reference tie-in: generalizes the reference's GROUP BY count reports
(sql/queries.sql:22-45) to the unbounded-stream regime where exact
global counts stop being maintainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_summary(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """``(key, cnt, thresh)`` — the slice's exact top-k counts (ties
    broken by key ascending, so the summary is a pure function of the
    slice) with the exact max dropped count as a constant ``thresh``
    column (0 when the vocabulary fits within k). NULL keys are
    excluded (a NULL token is not a countable key).

    Keys are stored AS STRINGS, unconditionally: ``exact_recount``
    joins stored candidates back to a string-cast corpus key, and a
    numeric summary key would make Spark coerce that comparison via
    DOUBLE — ids beyond ~2^53 would spuriously match or miss. Casting
    here (matching HeavyHitterMaintenance) keeps both join sides string
    on every call path and the output key type stable. Distinct values
    stay distinct under the cast, so counts are unaffected; tie-break
    order is the string order of the stored key either way."""
    if k < 1:
        raise ValueError("k must be >= 1")
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)  # two consumers: top-k + residual
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(int(k))
    dropped = counts.join(top.select("key"), "key", "left_anti").agg(
        F.coalesce(F.max("cnt"), F.lit(0)).cast("long").alias("thresh")
    )
    return top.crossJoin(F.broadcast(dropped))


def merged_bounds(summaries: DataFrame) -> DataFrame:
    """Merge per-slice summaries (``batch_id, key, cnt, thresh`` rows)
    into ``(key, lower, upper)`` bounds on each key's true total:
    ``lower`` sums the stored exact counts; ``upper`` adds the
    thresholds of every slice that DROPPED the key. Operates entirely
    on the tiny summary frames."""
    per_slice = summaries.groupBy("batch_id").agg(
        F.max("thresh").alias("t")  # thresh is constant within a slice
    )
    total = per_slice.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("total_t")
    )
    present = (
        summaries.join(per_slice, "batch_id")
        .groupBy("key")
        .agg(
            F.sum("cnt").alias("lower"),
            F.sum("t").alias("present_t"),
        )
    )
    return present.crossJoin(F.broadcast(total)).select(
        "key",
        F.col("lower").cast("long").alias("lower"),
        (F.col("lower") + F.col("total_t") - F.col("present_t"))
        .cast("long")
        .alias("upper"),
    )


def heavy_hitters(summaries: DataFrame, min_count: int) -> DataFrame:
    """Keys whose true total MAY reach ``min_count`` (upper bound
    test): guaranteed to include every key whose true total is >=
    min_count provided min_count exceeds the sum of slice thresholds
    (the no-false-negative regime — below that, a key could hide
    entirely inside the truncations); may include false positives,
    which ``lower`` lets the caller triage or re-count exactly."""
    return (
        merged_bounds(summaries)
        .filter(F.col("upper") >= F.lit(int(min_count)))
        .orderBy(F.desc("lower"), F.asc("key"))
    )


def exact_recount(
    corpus: DataFrame,
    summaries: DataFrame,
    key_col: str,
    min_count: int,
) -> DataFrame:
    """The production two-phase heavy-hitter query: candidates from the
    kilobyte summaries (complete above the truncation bound), then ONE
    filtered pass over the corpus counting ONLY those keys exactly —
    ``(key, cnt)`` with no false positives and exact counts, ordered
    hot-first.

    Scale shape: the candidate set is <= the stored key count, so it
    broadcasts; the corpus pays one scan with a broadcast semi-join
    (hash probe per row, no shuffle of non-candidate rows) and the
    aggregation shuffles only candidate keys. This is the pattern that
    replaces "exact GROUP BY over everything" at 100 TB: the store
    prunes the key space, the scan only confirms.

    Oracle restatement (for a future driver slot — COVERAGE.md slot
    plan): given the candidate keys as literals ``(k1, .., kn)``, the
    output is exactly::

        SELECT CAST(key AS VARCHAR) AS key, COUNT(*) AS cnt
        FROM corpus WHERE CAST(key AS VARCHAR) IN (k1, .., kn)
        GROUP BY 1 HAVING COUNT(*) >= min_count
        ORDER BY cnt DESC, key

    — candidate selection is deterministic (summaries are pure
    functions of slice multisets), so the whole two-phase query is
    batch-restatable end to end.
    """
    candidates = heavy_hitters(summaries, min_count).select("key")
    counted = (
        corpus.select(F.col(key_col).cast("string").alias("key"))
        .join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(min_count)))
    )
    return counted.orderBy(F.desc("cnt"), F.asc("key"))
