"""Micro-batch-maintained token-budget histograms: the streaming form
of ``operators/selection.weight_histogram``, mirroring the drift
profile store (streaming/drift_maintenance.ProfileMonitor).

A 100 TB ingest pipeline re-selects its training corpus against a
token budget after every sync ("what is today's quality cutoff, and
which docs make the cut?"). The selection's only corpus-wide
aggregation is the weight histogram, and histogram algebra is EXACT
under union — bucket sums add, bucket mins min — so a store maintained
one micro-batch at a time answers the cutoff question identically to
histogramming all landed data at once, regardless of batch slicing
(pinned in tests). Feeding the maintained histogram into
``budget_select(hist=...)`` removes the histogram's corpus scan
entirely: a fresh selection over the landed corpus pays only the two
branch scans (full buckets by pure filter + the boundary bucket's
window).

Each batch writes its own tiny ``batch_id=<n>`` histogram directory
(the repo's idempotence recipe: an at-least-once replay overwrites
itself); the cumulative read is a bins-bounded aggregation over
kilobyte files and supports the shared crash-safe compaction.

Composes in one foreachBatch with the rest of the observability
family: ``gate.wrap(budget_hist.wrap(sink))`` maintains the cutoff
over contract-clean rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.selection import budget_select, weight_histogram
from .batch_layout import MicroBatchStore

HIST_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("bucket", T.IntegerType()),
    T.StructField("w", T.LongType()),
    T.StructField("wmin", T.LongType()),
]


class BudgetHistogram(MicroBatchStore):
    """Maintain the ``(bucket, w, wmin)`` weight histogram of a scored
    stream across micro-batches, under FROZEN edges (the drift-module
    contract: deriving edges per batch would make cutoffs
    incomparable). ``score_col``/``weight_col`` must exist on each
    batch — in a CDC pipeline, score in the same foreachBatch
    projection that feeds the sink. Built on the shared MicroBatchStore
    recipe; the histogram frame is bounded at len(edges)+1 rows."""

    def __init__(
        self,
        spark: SparkSession,
        score_col: str,
        weight_col: str,
        edges: tuple[float, ...],
        root: str,
    ) -> None:
        if not edges:
            raise ValueError("BudgetHistogram needs at least one edge")
        super().__init__(spark, root, "_budget_hist")
        self.score_col = score_col
        self.weight_col = weight_col
        self.edges = tuple(sorted(float(e) for e in edges))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Histogram one batch into its own directory (the shared
        collect-then-local-write path: bounded artifact, idempotent
        replay). Chain under QualityGate to count only contract-clean
        tokens: ``gate.wrap(budget_hist.wrap(sink))``."""
        self._write_batch(
            weight_histogram(
                batch_df, self.score_col, self.weight_col, self.edges
            ),
            batch_id,
        )

    # -- readers (stored histograms only; landed data never rescanned) -----
    def batch_histograms(self) -> DataFrame:
        """(batch_id, bucket, w, wmin) — one histogram per batch."""
        return self._read_store(HIST_FIELDS)

    def histogram(self) -> DataFrame:
        """(bucket, w, wmin) over all landed batches — exactly the
        weight_histogram of the landed corpus (sum/min algebra is exact
        under union; equality pinned in tests). Satisfies the
        ``budget_select(hist=...)`` contract by construction."""
        return (
            self.batch_histograms()
            .groupBy("bucket")
            .agg(F.sum("w").alias("w"), F.min("wmin").alias("wmin"))
        )

    def select(
        self,
        corpus: DataFrame,
        budget: int,
        tiebreak_col: str,
    ) -> DataFrame:
        """Budget-select over the landed ``corpus`` WITHOUT a histogram
        pass: the stored cumulative histogram locates the boundary, the
        corpus pays only the two branch scans. ``corpus`` must be the
        same rows the store has histogrammed (same scoring, all landed
        batches, nothing else) — that correspondence is the caller's
        pipeline invariant, pinned for the CDC shape in tests."""
        return budget_select(
            corpus,
            self.score_col,
            self.weight_col,
            budget,
            tiebreak_col,
            self.edges,
            hist=self.histogram(),
        )
