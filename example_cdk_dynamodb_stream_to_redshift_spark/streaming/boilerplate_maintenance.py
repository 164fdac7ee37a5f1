"""Micro-batch-maintained boilerplate detection: the streaming form of
``operators/boilerplate.py`` on the shared MicroBatchStore recipe.

Each micro-batch stores its own per-(group, segment) DOCUMENT-frequency
partial; count algebra is exact under union PROVIDED docs are
batch-unique (each document lands in exactly one batch — the
deduplicated-corpus contract shared with GroupCountStore), so the
merged read IS ``segment_docfreq`` of everything landed without
rescanning it. The companion group-size store is a GroupCountStore over
doc ids, so the ratio threshold — ``df_docs > ratio * n_docs(group)``
— is also answerable from store state alone: "what is this domain's
boilerplate, over the whole crawl so far" costs a read of the partials,
never a corpus pass.

Unlike the kilobyte artifact stores (histograms, samples), the segment
store is CORPUS-VOCABULARY-sized (one row per distinct (group, segment)
per batch) — the band-index class of store, written DISTRIBUTED into
the batch's own directory rather than collected through the driver;
``compact()`` owns the small-files consolidation.

``prune(corpus)`` applies the maintained drop set to any frame with the
operator's own join shape, equality-pinned against the direct batch
operator under arbitrary slicings in tests/test_boilerplate.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.boilerplate import segment_docfreq
from .batch_layout import MicroBatchStore
from .sample_maintenance import GroupCountStore


class SegmentDocFreqStore(MicroBatchStore):
    """Maintain per-(group, segment) document frequencies and per-group
    doc counts across micro-batches; derive the boilerplate drop set
    and prune frames from store state alone."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        group_cols: tuple[str, ...] = ("source",),
        delimiter: str = "\n",
    ) -> None:
        if len(group_cols) != 1:
            raise ValueError(
                "SegmentDocFreqStore currently maintains exactly one "
                f"group column, got {group_cols!r} (the batch operator "
                "supports more; extend the size store first)"
            )
        super().__init__(spark, root, "_segment_docfreq")
        self.text_col = text_col
        self.id_col = id_col
        self.group_cols = tuple(group_cols)
        self.delimiter = delimiter
        # NULL-group docs are excluded from BOTH maintained stores (the
        # GroupCountStore contract) — the batch operator prunes them
        # against each other; coalesce the group upstream if that
        # behavior is needed on a stream
        self._sizes = GroupCountStore(spark, group_cols[0], id_col, root)

    def _fields(self) -> list[T.StructField]:
        return [
            T.StructField("batch_id", T.IntegerType()),
            *[T.StructField(c, T.StringType()) for c in self.group_cols],
            T.StructField("h", T.StringType()),
            T.StructField("segment", T.StringType()),
            T.StructField("df_docs", T.LongType()),
        ]

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Write the batch's own docfreq partial (vocabulary-sized:
        DISTRIBUTED write into the batch's directory, not a driver
        collect) and the batch's group-size partial."""
        g = self.group_cols[0]
        part = segment_docfreq(
            batch_df.filter(F.col(g).isNotNull()),
            self.text_col,
            self.id_col,
            self.group_cols,
            self.delimiter,
        ).select(
            F.col(g).cast("string").alias(g),
            "h",
            "segment",
            F.col("df_docs").cast("long").alias("df_docs"),
        )
        part.write.mode("overwrite").parquet(
            os.path.join(self._store_dir, f"batch_id={batch_id}")
        )
        self._sizes.process_batch(batch_df, batch_id)

    # -- readers (store only; landed data never rescanned) ----------------
    def partials(self) -> DataFrame:
        return self._read_store(self._fields())

    def docfreq(self) -> DataFrame:
        """(group, h, segment, df_docs) over everything landed — equals
        segment_docfreq of the full corpus under the batch-unique-docs
        contract (sum of per-batch distinct-doc counts IS the global
        distinct-doc count when no doc spans batches)."""
        g = self.group_cols[0]
        return (
            self.partials()
            .groupBy(g, "h")
            .agg(
                F.any_value("segment").alias("segment"),
                F.sum("df_docs").alias("df_docs"),
            )
            .select(g, "h", "segment", "df_docs")
        )

    def group_sizes(self) -> DataFrame:
        """(group, n): documents landed per group (GroupCountStore)."""
        g = self.group_cols[0]
        return self._sizes.counts().select(
            F.col("group").alias(g), F.col("n").alias("_n_docs")
        )

    def drop_set(self, min_docs: int = 2, max_doc_ratio: float = 0.5) -> DataFrame:
        """(group, h, segment): the segments currently classified as
        boilerplate, from store state alone."""
        from ..operators.boilerplate import _validated

        min_docs, max_doc_ratio = _validated(min_docs, max_doc_ratio)
        g = self.group_cols[0]
        return (
            self.docfreq()
            .join(F.broadcast(self.group_sizes()), g)
            .filter(
                (F.col("df_docs") >= min_docs)
                & (
                    F.col("df_docs")
                    > F.lit(max_doc_ratio) * F.col("_n_docs").cast("double")
                )
            )
            .select(g, "h", "segment")
        )

    def prune(
        self,
        corpus: DataFrame,
        min_docs: int = 2,
        max_doc_ratio: float = 0.5,
    ) -> DataFrame:
        """Apply the maintained drop set to ``corpus`` — the operator's
        split/anti-join/reassemble shape with the docfreq pass replaced
        by the store. Output schema matches prune_frequent_segments."""
        g = self.group_cols[0]
        pattern = "\\Q" + self.delimiter + "\\E"
        base = corpus.select(
            F.col(g).cast("string").alias(g),
            F.col(self.id_col).alias("id"),
            F.split(
                F.coalesce(F.col(self.text_col), F.lit("")), pattern, -1
            ).alias("_segs"),
        )
        totals = base.select(g, "id", F.size("_segs").alias("n_segments"))
        sp = base.select(
            g, "id", F.posexplode("_segs").alias("seg_idx", "segment")
        ).withColumn("h", F.md5(F.col("segment").cast("binary")))
        drop = self.drop_set(min_docs, max_doc_ratio).select(g, "h")
        cond = (sp["h"] == drop["h"]) & sp[g].eqNullSafe(drop[g])
        kept = sp.join(drop, cond, "left_anti")
        reassembled = kept.groupBy("id").agg(
            F.count(F.lit(1)).alias("n_segments_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_idx", "segment"))
                    ),
                    lambda x: x["segment"],
                ),
                self.delimiter,
            ).alias("clean_text"),
        )
        zero = F.lit(0).cast("bigint")
        return totals.join(reassembled, "id", "left").select(
            F.col("id").alias(self.id_col),
            F.col("n_segments").cast("bigint").alias("n_segments"),
            F.coalesce("n_segments_kept", zero).alias("n_segments_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )

    def compact(self, target_partitions: int = 8, keep_last: int = 2) -> None:
        super().compact(target_partitions, keep_last)
        self._sizes.compact(1, keep_last)
