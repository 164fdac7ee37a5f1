"""Incremental view maintenance for grouped aggregates.

The reference maintains LATEST-STATE targets (delete+insert per key,
sql/incremental_sync_members.sql:38-52) and recomputes its reports
(sql/queries.sql:22-45) from scratch on every query. This operator closes
that gap: it maintains the REPORT itself — a grouped aggregate table —
incrementally from micro-batches, so a 100 TB event history never
re-aggregates: each refresh costs one micro-batch-sized partial
aggregation plus a merge against the (|groups|-sized) state.

Algebra: count/sum/min/max are mergeable — ``new_state = state ⊕
partial(batch)`` group-wise, where ⊕ is +, +, least, greatest
(null-tolerant: a group absent on one side keeps the other side's value).
avg is derived at read time as sum/count. approx_distinct keeps a
Datasketches HLL sketch (binary) per group — union is the register-wise
max, so accuracy never degrades with the number of merges (the estimate
can differ by a fraction of a percent from a one-shot sketch: the HIP
estimator is ingestion-path-dependent and unions fall back to the raw
estimator); read the number via ``read_with_distinct``.

Two maintenance modes:

- ``apply_batch`` — APPEND-ONLY streams; all five kinds supported.
- ``apply_delta`` — CDC streams with retractions: each row carries a
  signed ``_weight`` (+1 insert / -1 retract), the exact delta shape the
  engine's own merge materializes (``cdc_delta`` below: old images of
  replaced keys at -1, new non-REMOVE images at +1). Only the
  INVERTIBLE kinds are legal here — count adjusts by Σweight and sum by
  Σ(weight·value), so a MODIFY nets to (new−old) and a REMOVE
  subtracts; min/max cannot un-see a retracted extremum without
  re-scanning the group's history and approx_distinct sketches have no
  difference operator, so constructing a delta-mode table with any of
  them raises. Groups whose support (the first count aggregate, which
  delta mode therefore requires) reaches 0 are DELETED from the state —
  a from-scratch GROUP BY has no row for an emptied group, and the
  maintained view must stay bit-identical to it.

This is the reference's architecture completed: its stream is CDC with
MODIFY/REMOVE (sql/incremental_sync_members.sql:42-52) and its reports
(sql/queries.sql:22-45) re-aggregate the latest-state targets on every
query; delta-mode maintenance turns those reports into views whose
refresh costs the micro-batch, never the 100 TB history.

Exactly-once effect on at-least-once foreachBatch: micro-batch ids from
one checkpoint are strictly increasing and a retry re-delivers the SAME
id, so the ledger is one integer — the last applied batch id — committed
ATOMICALLY with the state via ParquetTable's pointer metadata. A replay
(batch_id <= last_applied) is a no-op; a crash between the state write
and the pointer flip leaves the old pointer, and the retry re-applies
onto the old state. Double-counting is structurally impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KINDS = ("count", "sum", "min", "max", "approx_distinct")
# kinds with a subtraction operator — the only ones a retraction stream
# can maintain without re-aggregating history
_INVERTIBLE = ("count", "sum")


def cdc_delta(
    target: DataFrame,
    staged: DataFrame,
    key_col: str,
    cols: list[str],
    weight_col: str = "_weight",
) -> DataFrame:
    """Signed delta stream for one CDC merge (operators/merge.py): the
    merge replaces every staged key's target row (delete+insert,
    sql/incremental_sync_members.sql:42-52), so the view-maintenance
    delta is exactly

    - the OLD images: target rows whose key is staged, at weight -1
      (they are about to be deleted — the before-image the reference's
      DELETE..USING discards);
    - the NEW images: staged non-REMOVE rows, at weight +1.

    A MODIFY contributes both (net new−old); a REMOVE contributes only
    the retraction; an INSERT of a fresh key only the +1. Must be
    computed against the target BEFORE the merge commit (the caller's
    ordering obligation — CdcPipeline applies deltas pre-commit so a
    crash between the two replays idempotently on both sides).

    Same scale posture as the merge itself: the staged key set is
    micro-batch-sized and broadcast, so the (huge) target is probed
    map-side with zero shuffle.
    """
    keys = F.broadcast(staged.select(key_col).distinct())
    old = (
        target.join(keys, key_col, "left_semi")
        .select(*cols)
        .withColumn(weight_col, F.lit(-1).cast("long"))
    )
    new = (
        staged.filter(F.col("eventName") != F.lit("REMOVE"))
        .select(*cols)
        .withColumn(weight_col, F.lit(1).cast("long"))
    )
    return old.unionByName(new)


class IncrementalAggTable:
    """A grouped aggregate maintained incrementally across micro-batches.

    ``aggs``: list of (out_col, kind, in_col) with kind in
    count|sum|min|max (in_col ignored for count). ``out_types`` maps each
    out_col to its Spark type (count is always long).

    ``retractable=True`` declares the table will be fed CDC deltas via
    ``apply_delta``: every kind must then be invertible (count/sum) and
    the FIRST aggregate must be a count — it is the group's support,
    used to delete emptied groups. ``apply_batch`` still works on such a
    table (an append-only batch is a delta with all weights +1).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        key_types: list[T.DataType],
        aggs: list[tuple[str, str, str | None]],
        out_types: dict[str, T.DataType] | None = None,
        retractable: bool = False,
    ):
        from ..operators.storage import ParquetTable

        for out, kind, _ in aggs:
            if kind not in _KINDS:
                raise ValueError(f"unsupported aggregate {kind!r} for {out!r}")
        if retractable:
            bad = [
                (out, kind) for out, kind, _ in aggs if kind not in _INVERTIBLE
            ]
            if bad:
                raise ValueError(
                    "retractable table requires invertible aggregates "
                    f"(count/sum); {bad!r} cannot subtract a retraction — "
                    "min/max would need the group's full history to recover "
                    "a retracted extremum, and HLL sketches have no "
                    "difference operator. Maintain those append-only, or "
                    "recompute from the latest-state target."
                )
            if aggs[0][1] != "count":
                raise ValueError(
                    "retractable table requires its first aggregate to be a "
                    "count: it is the group's support, used to drop groups "
                    "whose membership reaches zero"
                )
        self.retractable = retractable
        self.key_cols = list(key_cols)
        self.aggs = list(aggs)
        fields = [
            T.StructField(k, t) for k, t in zip(key_cols, key_types)
        ] + [
            T.StructField(
                out,
                T.LongType()
                if kind == "count"
                else T.BinaryType()
                if kind == "approx_distinct"
                else (out_types or {}).get(out, T.DoubleType()),
            )
            for out, kind, _ in aggs
        ]
        self.table = ParquetTable(spark, path, T.StructType(fields))

    # -- maintenance --------------------------------------------------------
    def last_applied(self) -> int:
        return self.table.meta().get("last_batch", -1)

    def _partial(
        self, batch: DataFrame, weight_col: str | None = None
    ) -> DataFrame:
        """Batch-sized partial aggregate; with ``weight_col``, the signed
        (delta-mode) form: count → Σw, sum → Σ(w·value)."""
        w = F.col(weight_col) if weight_col else F.lit(1)
        exprs = []
        for out, kind, col in self.aggs:
            field = self.table.schema[out].dataType
            if kind == "count":
                exprs.append(F.sum(w).cast("long").alias(out))
            elif kind == "approx_distinct":
                exprs.append(F.hll_sketch_agg(col).alias(out))
            elif kind == "sum":
                exprs.append(
                    F.sum(w.cast(field) * F.col(col).cast(field))
                    .cast(field)
                    .alias(out)
                )
            else:
                agg = {"min": F.min, "max": F.max}[kind]
                exprs.append(agg(F.col(col).cast(field)).cast(field).alias(out))
        return batch.groupBy(*self.key_cols).agg(*exprs)

    def _merge_col(self, out: str, kind: str) -> F.Column:
        # dataset aliases must not collide with USER column names ("s"
        # was a perfectly reasonable sum column — and ambiguous)
        a, b = F.col(f"__ivm_state.{out}"), F.col(f"__ivm_partial.{out}")
        field = self.table.schema[out].dataType
        if kind in ("count", "sum"):
            zero = F.lit(0).cast(field)
            # cast back to the declared type: decimal addition widens
            # precision (18,2 + 18,2 -> 19,2) and the state schema must
            # stay stable across commits
            return (F.coalesce(a, zero) + F.coalesce(b, zero)).cast(field).alias(out)
        if kind == "approx_distinct":
            # HLL union is the register-wise max; a group absent on one
            # side keeps the other side's sketch
            return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(
                F.hll_union(a, b)
            ).alias(out)
        op = F.least if kind == "min" else F.greatest
        # least/greatest propagate nulls asymmetrically across engines;
        # coalesce pairing keeps the present side when a group is absent
        return F.coalesce(op(a, b), a, b).cast(field).alias(out)

    def _merge_partial(self, partial: DataFrame, batch_id: int) -> None:
        state = self.table.read().alias("__ivm_state")
        partial = partial.alias("__ivm_partial")
        keys = [
            F.coalesce(
                F.col(f"__ivm_state.{k}"), F.col(f"__ivm_partial.{k}")
            ).alias(k)
            for k in self.key_cols
        ]
        merged = state.join(partial, on=self.key_cols, how="full_outer").select(
            *keys, *[self._merge_col(out, kind) for out, kind, _ in self.aggs]
        )
        if self.retractable:
            # a group whose support hits zero has no row in the
            # from-scratch aggregate — drop it (support is the first
            # aggregate, enforced by the constructor)
            merged = merged.filter(F.col(self.aggs[0][0]) != 0)
        self.table.overwrite(merged, meta={"last_batch": batch_id})

    def apply_batch(self, batch: DataFrame, batch_id: int) -> bool:
        """Merge one micro-batch into the state; returns False (no-op) for
        an already-applied batch id (at-least-once replay)."""
        if batch_id <= self.last_applied():
            return False
        self._merge_partial(self._partial(batch), batch_id)
        return True

    def apply_delta(
        self, delta: DataFrame, batch_id: int, weight_col: str = "_weight"
    ) -> bool:
        """Merge one signed CDC delta (see ``cdc_delta``) into the state;
        same exactly-once ledger as ``apply_batch``. MODIFY nets to
        (new−old), REMOVE subtracts, emptied groups are deleted."""
        if not self.retractable:
            raise ValueError(
                "apply_delta requires a retractable=True table (invertible "
                "aggregates with a leading count support column)"
            )
        if batch_id <= self.last_applied():
            return False
        self._merge_partial(self._partial(delta, weight_col), batch_id)
        return True

    def bootstrap(self, rows: DataFrame) -> None:
        """Initialize the state from an existing table's CURRENT contents
        (the initial-load complement of delta maintenance: the first
        delta batch arrives against a target the bulk COPY already
        populated, scripts/initial_load_from_export.sh). Overwrites any
        prior state and resets the ledger so batch 0 is the next apply."""
        self.table.overwrite(self._partial(rows), meta={"last_batch": -1})

    def foreach_batch(self):
        """The function to hand to ``writeStream.foreachBatch`` (runs on
        the driver; nothing here is pickled to workers)."""

        def apply(batch: DataFrame, batch_id: int) -> None:
            self.apply_batch(batch, batch_id)

        return apply

    # -- reads ---------------------------------------------------------------
    def read(self) -> DataFrame:
        return self.table.read()

    def read_with_avg(self, avg_col: str, sum_col: str, count_col: str) -> DataFrame:
        """State plus a derived average (sum/count) — avg is not mergeable
        directly but its components are."""
        return self.table.read().withColumn(
            avg_col,
            F.col(sum_col).cast("double") / F.col(count_col).cast("double"),
        )

    def read_with_distinct(self, est_col: str, sketch_col: str) -> DataFrame:
        """State with the HLL sketch column resolved to its cardinality
        estimate (the sketch itself stays in the state for future
        merges)."""
        return self.table.read().withColumn(
            est_col, F.hll_sketch_estimate(F.col(sketch_col))
        )
