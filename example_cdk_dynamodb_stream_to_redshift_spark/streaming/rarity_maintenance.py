"""Micro-batch-maintained shingle rarity: the streaming form of
``operators/rarity.py`` on the batch-id store layout.

Per-batch document frequencies of word n-grams are additive under the
deduplicated-corpus contract (each document lands in exactly ONE batch
— the SegmentDocFreqStore/GroupCountStore contract), so the corpus-wide
docfreq, its spectrum, and the per-doc uniqueness profile are all
answerable from stored partials without ever rescanning landed text:

- shingle partials ``(g, df, owner)`` — the batch's distinct-doc count
  per md5 shingle plus its MINIMUM doc id. For a globally-unique
  shingle (summed df = 1) exactly one batch contributed, so the min
  over stored owners IS the owning document — per-doc uniqueness needs
  no join back to any corpus text.
- per-doc totals ``(id, n_shingles)`` — every batch doc's distinct
  shingle count (0 for docs shorter than n tokens), written once at
  landing like the cluster store's assignments.

Both partials are corpus-vocabulary / corpus-doc sized — the
band-index class of store — so they are written DISTRIBUTED into each
batch's own directory (overwrite = replay-idempotent) rather than
collected through the driver; ``compact()`` owns small-files
consolidation for both roots. Equality with the batch operators over
everything landed is pinned under arbitrary slicings in
tests/test_rarity_maintenance.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.rarity import _doc_shingles
from .batch_layout import ForeachBatchStore, read_root

SHINGLE_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("g", T.StringType()),
    T.StructField("df", T.LongType()),
    T.StructField("owner", T.LongType()),
]
TOTAL_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("id", T.LongType()),
    T.StructField("n_shingles", T.LongType()),
]


class ShingleDocFreqStore(ForeachBatchStore):
    """Maintain word-``n``-gram document frequencies and per-doc
    distinct-shingle totals across micro-batches of documents;
    ``docfreq()``/``spectrum()``/``uniqueness()`` reproduce the batch
    operators (shingle_docfreq / docfreq_spectrum / uniqueness_profile)
    over everything landed, store-only."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 8,
    ) -> None:
        if n < 1:
            raise ValueError("n must be >= 1")
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self.n = int(n)
        self._shingle_dir = os.path.join(root, "_shingle_docfreq")
        self._totals_dir = os.path.join(root, "_doc_shingle_totals")

    def _store_roots(self) -> list[str]:
        return [self._shingle_dir, self._totals_dir]

    # -- write path ---------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Write the batch's shingle partial and per-doc totals, each
        into its own ``batch_id=<n>`` directory (distributed writes —
        the partials are vocabulary/doc sized, never driver-collected).
        Valid under the corpus contract that a doc id never spans
        batches (exact-dedup ingestion guarantees it)."""
        sh = _doc_shingles(
            batch_df, self.text_col, self.id_col, self.n
        ).localCheckpoint()  # two aggregations below; one shingle pass
        gdf = sh.groupBy("g").agg(
            F.count(F.lit(1)).alias("df"), F.min("id").alias("owner")
        )
        gdf.write.mode("overwrite").parquet(
            os.path.join(self._shingle_dir, f"batch_id={batch_id}")
        )
        counts = sh.groupBy("id").agg(
            F.count(F.lit(1)).alias("n_shingles")
        )
        totals = (
            batch_df.select(F.col(self.id_col).alias("id"))
            .filter(F.col("id").isNotNull())
            .distinct()
            .join(counts, "id", "left")
            .select(
                "id", F.coalesce("n_shingles", F.lit(0)).alias("n_shingles")
            )
        )
        totals.write.mode("overwrite").parquet(
            os.path.join(self._totals_dir, f"batch_id={batch_id}")
        )

    # -- readers (stored partials only; landed text never rescanned) -------
    def _global_df(self) -> DataFrame:
        partials = read_root(self.spark, self._shingle_dir, SHINGLE_FIELDS)
        return partials.groupBy("g").agg(
            F.sum("df").alias("df"), F.min("owner").alias("owner")
        )

    def docfreq(self) -> DataFrame:
        """(g, df) over everything landed — equals
        operators/rarity.shingle_docfreq of the accumulated corpus."""
        return self._global_df().select("g", "df")

    def spectrum(self) -> DataFrame:
        """(df, n_shingles) — equals docfreq_spectrum of the landed
        corpus; the dedup/boilerplate threshold-sizing histogram,
        answered from partials alone."""
        return (
            self.docfreq()
            .groupBy("df")
            .agg(F.count(F.lit(1)).alias("n_shingles"))
            .orderBy("df")
        )

    def uniqueness(self) -> DataFrame:
        """(id_col, n_shingles, n_unique) — equals uniqueness_profile of
        the landed corpus. A summed df = 1 shingle was contributed by
        exactly one batch, so its stored min owner is the owning doc;
        n_unique is one aggregation over those rows."""
        uniq = (
            self._global_df()
            .filter(F.col("df") == 1)
            .groupBy(F.col("owner").alias("id"))
            .agg(F.count(F.lit(1)).alias("n_unique"))
        )
        # Guard the 'a doc id never spans batches' contract this store's
        # correctness rests on: a violating feed would double-count df and
        # emit duplicate per-doc rows here. Each batch writes one distinct
        # id row, so a duplicate in totals IS a cross-batch repeat — fail
        # loudly (the ClusterMaintenance layout-contract precedent) instead
        # of returning wrong numbers. The check rides the id aggregation
        # IN-PLAN (the join shuffles totals on id anyway, so Catalyst
        # shares the partitioning): uniqueness() stays lazy and costs no
        # extra job, and a violation raises at execution (r11 review
        # rejected the eager per-call collect form).
        totals = (
            read_root(self.spark, self._totals_dir, TOTAL_FIELDS)
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).alias("_nb"),
                F.min("n_shingles").alias("n_shingles"),
            )
            .select(
                "id",
                F.when(
                    F.col("_nb") > 1,
                    F.raise_error(
                        F.concat(
                            F.lit("doc id "),
                            F.col("id").cast("string"),
                            F.lit(
                                " appears in more than one landed batch "
                                "(contract: a doc id never spans "
                                "batches) — dedup the feed (exact-dedup "
                                "ingestion) before maintaining docfreq"
                            ),
                        )
                    ).cast("long"),
                ).otherwise(F.col("n_shingles")).alias("n_shingles"),
            )
        )
        return totals.join(uniq, "id", "left").select(
            F.col("id").alias(self.id_col),
            "n_shingles",
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        )

