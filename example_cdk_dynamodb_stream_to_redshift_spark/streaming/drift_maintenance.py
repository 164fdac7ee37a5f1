"""Micro-batch-maintained distribution profiles: the streaming form of
operators/drift.py, mirroring the KMV sketch store
(streaming/sketch_maintenance.py).

Histogram-profile algebra is EXACT under union — counts add — so a
profile store maintained one micro-batch at a time answers every later
distribution question identically to profiling all landed data at once,
regardless of batch slicing (pinned in tests). Each batch writes its
own tiny ``batch_id=<n>`` profile directory (the repo's idempotence
recipe: an at-least-once replay overwrites itself), and the monitor
reads:

- ``profiles()`` — the per-batch long-format rows, the drift TREND
  table (PSI of each batch against the frozen baseline shows exactly
  when the corpus shifted);
- ``cumulative_profile()`` — counts summed by (column, bucket), equal
  to profiling the whole landed corpus directly;
- ``trend(baseline)`` / ``cumulative_report(baseline)`` — PSI tables,
  computed entirely from stored profiles (the data is never rescanned).

Scale shape: the only thing that ever sees batch data is the one-scan
profile aggregation; the store grows by (cols x buckets) rows per batch
— kilobytes — and supports the shared crash-safe compaction.

Composes with, not replaces, the quality gate: QualityGate enforces row
CONTRACTS per batch; this watches DISTRIBUTIONS across batches. Chain
them in one foreachBatch: ``gate.wrap(monitor.wrap(sink))``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.drift import ProfileSpec, profile, psi_report
from .batch_layout import MicroBatchStore

PROFILE_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("column", T.StringType()),
    T.StructField("bucket", T.StringType()),
    T.StructField("cnt", T.LongType()),
]


class ProfileMonitor(MicroBatchStore):
    """Per-batch drift-profile store on the shared MicroBatchStore
    recipe; the profile frame is bounded at cols x buckets rows."""

    def __init__(
        self, spark: SparkSession, specs: list[ProfileSpec], root: str
    ) -> None:
        if not specs:
            raise ValueError("ProfileMonitor needs at least one ProfileSpec")
        super().__init__(spark, root, "_drift_profiles")
        self.specs = list(specs)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Profile one batch into its own directory (the shared
        collect-then-local-write path: bounded artifact, idempotent
        replay). Chain under QualityGate to profile only contract-clean
        rows: ``gate.wrap(monitor.wrap(sink))``."""
        self._write_batch(profile(batch_df, self.specs), batch_id)

    # -- readers (stored profiles only; landed data never rescanned) -------
    def profiles(self) -> DataFrame:
        """(batch_id, column, bucket, cnt) — one profile per batch."""
        return self._read_store(PROFILE_FIELDS)

    def cumulative_profile(self) -> DataFrame:
        """(column, bucket, cnt) over all landed batches — exactly the
        profile of the landed corpus (count algebra is exact under
        union; equality pinned in tests)."""
        return (
            self.profiles()
            .groupBy("column", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def cumulative_report(self, baseline: DataFrame, **kw) -> DataFrame:
        """PSI of everything landed so far vs the frozen baseline."""
        return psi_report(self.cumulative_profile(), baseline, **kw)

    def trend(
        self,
        baseline: DataFrame,
        eps: float = 1e-6,
        drift_threshold: float = 0.2,
    ) -> DataFrame:
        """(batch_id, column, psi, n_current, n_baseline, drifted) —
        each batch scored against the baseline independently: the
        WHEN-did-it-shift table.

        ONE bounded plan regardless of stream age: per-batch profiles
        carry the FULL declared bucket support (profile() materializes
        zero-count buckets precisely so this join needs no outer
        gymnastics), so a single left join to the baseline plus one
        grouped aggregation scores every batch — not a per-batch-id
        loop of unioned join subtrees, whose Catalyst plan grew O(B)
        with stream lifetime (r8 review finding). Requires the baseline
        to share this monitor's specs, which comparability demands
        anyway; empty batches score psi = NULL / drifted = false."""
        from ..operators.drift import _psi_from_joined

        cur = self.profiles().select(
            "batch_id", "column", "bucket", F.col("cnt").alias("cnt_cur")
        )
        base = baseline.select(
            "column", "bucket", F.col("cnt").alias("cnt_base")
        )
        joined = cur.join(F.broadcast(base), ["column", "bucket"], "left").select(
            "batch_id",
            "column",
            "cnt_cur",
            F.coalesce("cnt_base", F.lit(0)).alias("cnt_base"),
        )
        return _psi_from_joined(
            joined, ["batch_id", "column"], eps, drift_threshold
        ).select(
            "batch_id", "column", "psi", "n_current", "n_baseline", "drifted"
        )

