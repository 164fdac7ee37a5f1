"""Streaming data-quality gate: a declarative expectation suite applied
to every micro-batch, with a maintained violations-report table and a
quarantine split — the Deequ-on-streams posture, built from the
engine's existing pieces.

The batch operators (operators/expectations.py) answer "does this TABLE
conform"; a pipeline ingesting continuously needs the same contract
enforced per micro-batch, with three artifacts a production stream
owns:

- a REPORT table: one row per (batch, check) — violations, row count,
  pass/fail — the thing dashboards and alerts read (the reference's
  sync-run-log instinct generalized from row counts to contract
  conformance);
- a QUARANTINE table: the violating rows themselves, tagged with the
  array of failed check names (the CDC dead-letter recipe applied to
  TYPED rows after parsing, not just malformed envelopes);
- the CLEAN stream: rows passing every row-level check, handed to the
  caller's sink.

Cost shape per batch: ONE validate() aggregation over one pass of the
cached batch (N checks never cost N scans — operators/expectations.py),
plus pure-projection splits. The batch is persisted once so the three
consumers (report, quarantine, sink) never recompute the source.

Idempotence is the repo's batch-layout recipe (streaming/
batch_layout.py): report and quarantine writes OVERWRITE their own
``batch_id=<n>`` directory, so an at-least-once foreachBatch replay
rewrites its own artifacts instead of double-counting; both stores
support the shared crash-safe compaction.

Scope note, stated rather than implied: uniqueness checks participate
in the per-batch REPORT (duplicates WITHIN the batch) but not the row
split — table-level checks have no per-row blame, and cross-batch
uniqueness is the CDC merge's job (latest-per-key collapse), not a
gate's. At 100 TB the gate is embarrassingly parallel: every artifact
is bounded by (checks x batches) or by the violating-row volume, and
nothing here shuffles the stream.

Reference tie-in: the reference trusts its stream blindly
(SURVEY.md: no validation between Kinesis and the MV); this is the
abort/quarantine instinct of sources/cdc_envelope.py and merge.py ST8
promoted to declarative, per-batch table contracts.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.expectations import Check, split_violations, validate

# batch_id comes from partition-directory discovery on read (IntegerType,
# matching every other batch_id= store in the repo) — it is NOT written
# as a data column, which would shadow-duplicate the partition column
REPORT_FIELDS = [
    T.StructField("batch_id", T.IntegerType()),
    T.StructField("check", T.StringType()),
    T.StructField("n_rows", T.LongType()),
    T.StructField("violations", T.LongType()),
    T.StructField("passed", T.BooleanType()),
]


class BatchContractError(RuntimeError):
    """Raised in ``mode='abort'`` when a batch violates the contract —
    the batch's writes are NOT published (report/quarantine for the
    failing batch are written first so the failure is observable), and
    the streaming query stops, the ST8 posture for table contracts."""


class QualityGate:
    """Wraps a caller's foreachBatch sink with the expectation suite.

    >>> gate = QualityGate(spark, checks, root_dir)
    >>> stream.writeStream.foreachBatch(gate.wrap(sink)).start()

    ``mode='quarantine'`` (default): violating rows are diverted, clean
    rows flow to the sink, the stream keeps running. ``mode='abort'``:
    any violation stops the stream after recording the report +
    quarantine for the offending batch (contract-gate semantics).
    """

    def __init__(
        self,
        spark: SparkSession,
        checks: list[Check],
        root: str,
        mode: str = "quarantine",
    ) -> None:
        if mode not in ("quarantine", "abort"):
            raise ValueError(f"mode must be 'quarantine' or 'abort', got {mode!r}")
        self.spark = spark
        self.checks = list(checks)
        self.root = root
        self.mode = mode
        self.report_dir = os.path.join(root, "_quality_report")
        self.quarantine_dir = os.path.join(root, "_quality_quarantine")

    # -- per-batch core (pure-ish: also usable outside streaming) ----------
    def process_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        sink: Callable[[DataFrame, int], None] | None = None,
        persist: bool = True,
    ) -> dict:
        """Validate one batch: write its report + quarantine rows into
        their own ``batch_id=`` directories (replay overwrites), hand
        clean rows to ``sink``. Returns ``{"n_rows", "n_clean",
        "n_quarantined", "failed_checks", "clean"}`` — ``clean`` is the
        clean-rows DataFrame, for callers embedding the gate in a larger
        batch flow (the sink callback remains the streaming-facing way).
        ``persist=False`` skips caching the batch when the CALLER already
        holds it cached (CdcPipeline's persisted tagged extract) — a
        second persist would duplicate every row in executor memory."""
        if persist:
            batch_df = batch_df.persist()
        try:
            report = validate(batch_df, self.checks)
            # ONE job: toArrow materializes the bounded report (one row
            # per check) on the driver; the report dir is then written
            # driver-side (batch_layout.write_local_batch_dir) instead
            # of paying a second Spark job + commit protocol for a
            # kilobyte artifact (r13, the _write_sync_log precedent).
            # batch_id is supplied by the directory on read, never stored
            # as a data column (it would shadow the partition column)
            tbl = report.toArrow()
            rows = tbl.to_pylist()  # dicts; r["check"] access unchanged
            from . import batch_layout

            batch_layout.write_local_batch_dir(
                tbl, os.path.join(self.report_dir, f"batch_id={batch_id}")
            )
            clean, flagged = split_violations(batch_df, self.checks)
            failed = [r["check"] for r in rows if not r["passed"]]
            # the report (already collected) says whether any ROW-LEVEL
            # check failed; an all-clean batch — the overwhelmingly
            # common case — skips the quarantine write job entirely
            # (the dead-letter isEmpty idiom). Deterministic, so replay
            # agrees: the same batch re-derives the same (non-)write.
            row_level = {
                ck.name for ck in self.checks if ck.predicate is not None
            }
            any_row_violations = any(
                not r["passed"] and r["check"] in row_level for r in rows
            )
            n_quarantined = 0
            if any_row_violations:
                # quarantine write before the sink/abort: if either fails
                # after, a replay rewrites both dirs — never double-counts
                n_quarantined = self._write_own_dir(
                    flagged, self.quarantine_dir, batch_id, count=True
                )
            if self.mode == "abort" and failed:
                raise BatchContractError(
                    f"batch {batch_id} violates contract checks {failed} "
                    f"({n_quarantined} row-level violations quarantined); "
                    "report and quarantine are recorded, the batch is NOT "
                    "published"
                )
            if sink is not None:
                sink(clean, batch_id)
            if rows:
                n_rows = rows[0]["n_rows"]
            else:  # no checks configured: everything is clean
                n_rows = batch_df.count()
            return {
                "n_rows": n_rows,
                "n_clean": n_rows - (n_quarantined or 0),
                "n_quarantined": n_quarantined or 0,
                "failed_checks": failed,
                "clean": clean,
            }
        finally:
            if persist:
                batch_df.unpersist()

    def wrap(
        self, sink: Callable[[DataFrame, int], None]
    ) -> Callable[[DataFrame, int], None]:
        """The foreachBatch callable: ``writeStream.foreachBatch(
        gate.wrap(my_sink))``."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df, batch_id, sink)

        return _fn

    # -- artifact readers ---------------------------------------------------
    def report(self) -> DataFrame:
        """(batch_id, check, n_rows, violations, passed) across all
        batches — the alerting/dashboard table."""
        from . import batch_layout

        return batch_layout.read_root(self.spark, self.report_dir, REPORT_FIELDS)

    def quarantine(self, empty_like: DataFrame | None = None) -> DataFrame:
        """All quarantined rows (source columns + failed_checks +
        batch_id). ``empty_like`` supplies the schema for the
        nothing-quarantined-yet case."""
        from . import batch_layout

        fields = []
        if empty_like is not None:
            fields = list(empty_like.schema.fields) + [
                T.StructField("failed_checks", T.ArrayType(T.StringType())),
                T.StructField("batch_id", T.IntegerType()),
            ]
        return batch_layout.read_root(self.spark, self.quarantine_dir, fields)

    def compact(self, target_partitions: int = 8, keep_last: int = 2) -> None:
        """Consolidate both stores' per-batch directory layouts (the
        shared crash-safe marker protocol in streaming/batch_layout.py)."""
        from . import batch_layout

        for root in (self.report_dir, self.quarantine_dir):
            if os.path.isdir(root):
                batch_layout.compact_root(
                    self.spark,
                    root,
                    target_partitions=target_partitions,
                    keep_last=keep_last,
                )

    # -- internals ----------------------------------------------------------
    def _write_own_dir(
        self, df: DataFrame, root: str, batch_id: int, count: bool = False
    ) -> int | None:
        """Overwrite this batch's own directory (the idempotence recipe).
        With ``count=True`` rides a count on the SAME job via observe."""
        target = os.path.join(root, f"batch_id={batch_id}")
        if count:
            from pyspark.sql import Observation

            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
            df.write.mode("overwrite").parquet(target)
            # the write action just completed on this thread, so the
            # observation's metrics are (about to be) delivered; get()
            # cannot wait on a never-run action here
            return obs.get["n"]
        df.write.mode("overwrite").parquet(target)
        return None
