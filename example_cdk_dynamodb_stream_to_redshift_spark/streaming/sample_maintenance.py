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
