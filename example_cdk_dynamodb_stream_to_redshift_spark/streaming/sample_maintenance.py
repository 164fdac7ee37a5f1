"""Micro-batch-maintained bottom-k uniform samples: the streaming form
of ``operators/bottomk.py`` on the shared MicroBatchStore recipe.

Each micro-batch contributes its own bottom-k partial (the k
hash-smallest distinct keys the batch saw, per stratum — bounded by
k x batch-strata rows however large the batch), written to its own
``batch_id=<n>`` directory. Because bottom-k algebra is EXACT under
union (min-k of a union is the min-k of the parts' min-ks), the merged
read ``sample()`` IS the bottom-k sample of everything landed — not an
approximation of it — and the landed data is never rescanned. The
sample is a pure function of the landed key SET, so replays,
re-partitionings, and compactions cannot change it (pinned in tests).

This is what ``df.sample``/``sampleBy`` cannot do on a stream: their
rand()-samples are neither reproducible nor mergeable, so "a uniform
sample of the corpus so far" costs a full rescan every time it is
asked. Here it costs a read of kilobytes, and the same artifact doubles
as the KMV distinct-count sketch (``distinct_estimate``).

Composes in one foreachBatch with the rest of the observability family:
``gate.wrap(sampler.wrap(sink))`` samples contract-clean rows only.

``GroupCountStore`` is the companion exact-population store (per-batch
``(group, n)`` partials, sum-merged): with both maintained, ANY
temperature re-mix of the landed corpus (operators/mixture.py) is
answered from kilobyte state — targets and kept keys — with zero
corpus scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.bottomk import (
    bottomk_keys,
    distinct_estimate,
    merge_samples,
    sample_rows,
)
from ..operators.weighted_sample import (
    merge_weighted_samples,
    weighted_sample_keys,
)
from .batch_layout import MicroBatchStore


class BottomKSample(MicroBatchStore):
    """Maintain a bottom-``k`` uniform key sample (per stratum, when
    ``strata_cols`` is given) across micro-batches. The store grows by
    <= k x batch-strata rows per batch regardless of batch size; the
    merged sample reads only the store.

    Keys are stored AS STRINGS (bottomk_keys' own convention), so the
    read schema is stable across store states; consumers joining back
    to a non-string key cast their side (``rows()`` does)."""

    def __init__(
        self,
        spark: SparkSession,
        key_col: str,
        k: int,
        root: str,
        strata_cols: tuple[str, ...] = (),
    ) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        super().__init__(spark, root, "_bottomk_sample")
        self.key_col = key_col
        self.k = int(k)
        self.strata_cols = tuple(strata_cols)

    def _fields(self) -> list[T.StructField]:
        return [
            T.StructField("batch_id", T.IntegerType()),
            *[T.StructField(c, T.StringType()) for c in self.strata_cols],
            T.StructField("key", T.StringType()),
            T.StructField("h", T.StringType()),
        ]

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Record the batch's own bottom-k partial (bounded, collected,
        overwritten into the batch's directory — idempotent replay)."""
        part = bottomk_keys(batch_df, self.key_col, self.k, self.strata_cols)
        if self.strata_cols:
            # stored strata are strings for the same schema-stability
            # reason as keys; grouping semantics are unaffected
            part = part.select(
                *[
                    part[c].cast("string").alias(c)
                    for c in self.strata_cols
                ],
                "key",
                "h",
            )
        self._write_batch(part, batch_id)

    # -- readers (stored partials only; landed data never rescanned) -------
    def partials(self) -> DataFrame:
        """(batch_id, strata..., key, h) — one bottom-k partial per
        batch."""
        return self._read_store(self._fields())

    def sample(self) -> DataFrame:
        """(strata..., key, h) — THE bottom-k sample of every key landed
        so far: exactly what bottomk_keys would return over the union of
        all batches (exact merge algebra; equality pinned in tests)."""
        return merge_samples(self.partials(), self.k, self.strata_cols)

    def rows(self, corpus: DataFrame, key_col: str | None = None) -> DataFrame:
        """Full corpus rows of the current sample: broadcast the
        kilobyte key set, ONE semi-join pass (the two-phase shape)."""
        return sample_rows(corpus, self.sample(), key_col or self.key_col)

    def distinct_estimate(self) -> DataFrame:
        """KMV distinct-key estimate from the sample itself — exact when
        a stratum's landed population fit inside k."""
        return distinct_estimate(self.sample(), self.k, self.strata_cols)


class WeightedSample(MicroBatchStore):
    """Maintain an Efraimidis-Spirakis weighted sample without
    replacement (operators/weighted_sample.py) across micro-batches:
    each batch stores its own top-k-by-priority partial (<= k x
    batch-strata rows), and because priorities are pure per-(seed, key)
    functions the merged read IS the weighted sample of everything
    landed — exact algebra, landed data never rescanned. The weighted
    twin of BottomKSample (same store recipe, same composition:
    ``gate.wrap(ws.wrap(sink))``)."""

    def __init__(
        self,
        spark: SparkSession,
        key_col: str,
        weight_col: str,
        k: int,
        root: str,
        strata_cols: tuple[str, ...] = (),
        seed: int = 0,
    ) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        super().__init__(spark, root, "_weighted_sample")
        self.key_col = key_col
        self.weight_col = weight_col
        self.k = int(k)
        self.strata_cols = tuple(strata_cols)
        self.seed = int(seed)

    def _fields(self) -> list[T.StructField]:
        return [
            T.StructField("batch_id", T.IntegerType()),
            *[T.StructField(c, T.StringType()) for c in self.strata_cols],
            T.StructField("key", T.StringType()),
            T.StructField("w", T.DoubleType()),
            T.StructField("pr", T.DoubleType()),
        ]

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        part = weighted_sample_keys(
            batch_df,
            self.key_col,
            self.weight_col,
            self.k,
            self.strata_cols,
            self.seed,
        )
        if self.strata_cols:
            part = part.select(
                *[part[c].cast("string").alias(c) for c in self.strata_cols],
                "key",
                "w",
                "pr",
            )
        self._write_batch(part, batch_id)

    def partials(self) -> DataFrame:
        """(batch_id, strata..., key, w, pr) — one partial per batch."""
        return self._read_store(self._fields())

    def sample(self) -> DataFrame:
        """(strata..., key, w, pr) — THE weighted sample of every key
        landed so far (exact merge algebra, equality pinned)."""
        return merge_weighted_samples(
            self.partials(), self.k, self.strata_cols
        )

    def rows(self, corpus: DataFrame, key_col: str | None = None) -> DataFrame:
        """Full corpus rows of the current sample: broadcast the key
        set, ONE semi-join pass (the two-phase shape)."""
        return sample_rows(corpus, self.sample(), key_col or self.key_col)


class GroupCountStore(MicroBatchStore):
    """Maintain EXACT per-group distinct-key populations across
    micro-batches: each batch contributes its own ``(group, n)`` partial
    (bounded by the batch's group count), and the cumulative count is a
    plain SUM over the store — exact under union because count algebra
    is, PROVIDED keys are batch-unique (each key lands in exactly one
    batch: the deduplicated-corpus contract that
    streaming/corpus.CorpusIngestPipeline enforces at ingest). For a
    stream that re-delivers keys across batches the sum is an upper
    bound — use BottomKSample.distinct_estimate (KMV) there instead.

    Together with BottomKSample this closes the zero-scan re-mix loop:
    ``operators/mixture.mixture_from_sample(sampler.sample(),
    counter.counts(), ...)`` answers ANY (alpha, budget) temperature mix
    of the landed corpus — targets AND sample — from kilobyte state
    (equality to the direct corpus mix pinned in tests/test_mixture.py).
    """

    def __init__(
        self,
        spark: SparkSession,
        group_col: str,
        key_col: str,
        root: str,
    ) -> None:
        super().__init__(spark, root, "_group_counts")
        self.group_col = group_col
        self.key_col = key_col

    def _fields(self) -> list[T.StructField]:
        return [
            T.StructField("batch_id", T.IntegerType()),
            T.StructField("group", T.StringType()),
            T.StructField("n", T.LongType()),
        ]

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        part = (
            batch_df.filter(
                F.col(self.key_col).isNotNull()
                & F.col(self.group_col).isNotNull()
            )
            .select(
                F.col(self.group_col).cast("string").alias("group"),
                F.col(self.key_col).cast("string").alias("key"),
            )
            .distinct()
            .groupBy("group")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        self._write_batch(part, batch_id)

    def partials(self) -> DataFrame:
        """(batch_id, group, n) — one count partial per batch."""
        return self._read_store(self._fields())

    def counts(self) -> DataFrame:
        """(group, n): the distinct-key population per group over every
        key landed so far — exact under the batch-unique-keys contract
        (module docstring). Reads only the store."""
        from pyspark.sql import functions as F

        return self.partials().groupBy("group").agg(F.sum("n").alias("n"))
