"""Micro-batch-maintained heavy-hitter summaries: the streaming form of
``operators/heavyhitters.py`` on the shared MicroBatchStore recipe.

Each micro-batch is summarized by its exact top-k counts + truncation
threshold (a pure function of the batch's multiset — reproducible,
unlike order-dependent Misra-Gries state), written to its own
``batch_id=<n>`` directory; merged reads (``bounds()``, ``hitters()``)
answer "which keys are hot, and how hot, over everything landed" from
the kilobyte store alone with per-key [lower, upper] guarantees —
landed data is never rescanned. The guarantee degrades gracefully and
HONESTLY: every per-batch truncation adds its threshold to absent
keys' upper bounds, so uncertainty is visible in the artifact itself
rather than silent.

Composes in one foreachBatch with the rest of the observability
family: ``gate.wrap(hh.wrap(sink))`` tracks hot keys over
contract-clean rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.heavyhitters import batch_summary, heavy_hitters, merged_bounds
from .batch_layout import MicroBatchStore

SUMMARY_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("key", T.StringType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("thresh", T.LongType()),
]


class HeavyHitterMaintenance(MicroBatchStore):
    """Maintain per-batch top-``k`` summaries of ``key_col`` across
    micro-batches. Larger ``k`` tightens the bounds (k >= batch
    vocabulary makes them exact); the store grows by <= k+ rows per
    batch regardless of batch size.

    Keys are stored AS STRINGS (cast before summarizing): the store's
    read schema is fixed, so ``summaries()``/``bounds()`` return the
    same key type whether the store is empty or populated — a
    caller-typed column would flip between the declared empty schema
    and the parquet-inferred one with store state (r9 review finding).
    Distinct values stay distinct under the cast, so counts are
    unaffected; consumers joining back to a non-string key cast their
    side."""

    def __init__(
        self, spark: SparkSession, key_col: str, k: int, root: str
    ) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        super().__init__(spark, root, "_heavy_hitters")
        self.key_col = key_col
        self.k = int(k)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Summarize one batch into its own directory (the shared
        collect-then-local-write path: bounded artifact, idempotent
        replay). Chain under QualityGate to count only contract-clean
        rows: ``gate.wrap(hh.wrap(sink))``."""
        keyed = batch_df.select(
            F.col(self.key_col).cast("string").alias(self.key_col)
        )
        self._write_batch(batch_summary(keyed, self.key_col, self.k), batch_id)

    # -- readers (stored summaries only; landed data never rescanned) ------
    def summaries(self) -> DataFrame:
        """(batch_id, key, cnt, thresh) — one summary per batch."""
        return self._read_store(SUMMARY_FIELDS)

    def bounds(self) -> DataFrame:
        """(key, lower, upper) bounds on every stored key's true total
        over all landed batches."""
        return merged_bounds(self.summaries())

    def hitters(self, min_count: int) -> DataFrame:
        """Keys whose true total may reach ``min_count`` — complete
        (no false negatives) whenever min_count exceeds the sum of the
        stored thresholds; see operators/heavyhitters.heavy_hitters."""
        return heavy_hitters(self.summaries(), min_count)

    def recount(
        self, corpus: DataFrame, min_count: int, key_col: str | None = None
    ) -> DataFrame:
        """Two-phase exact heavy hitters over the landed ``corpus``:
        candidates from the store (complete above the summed
        thresholds), exact counts from ONE broadcast-semi-join scan —
        no false positives. ``key_col`` defaults to the store's own."""
        from ..operators.heavyhitters import exact_recount

        return exact_recount(
            corpus, self.summaries(), key_col or self.key_col, min_count
        )
