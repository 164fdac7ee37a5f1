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
estimator); read the number via ``read_with_distinct``. Scope: APPEND-ONLY streams —
retractions would need invertible aggregates (count/sum subtract fine;
min/max do not) or re-aggregation; the CDC latest-state targets
(operators/merge.py) remain the tool for update/delete semantics.

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


class IncrementalAggTable:
    """A grouped aggregate maintained incrementally across micro-batches.

    ``aggs``: list of (out_col, kind, in_col) with kind in
    count|sum|min|max (in_col ignored for count). ``out_types`` maps each
    out_col to its Spark type (count is always long).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        key_types: list[T.DataType],
        aggs: list[tuple[str, str, str | None]],
        out_types: dict[str, T.DataType] | None = None,
    ):
        from ..operators.storage import ParquetTable

        for out, kind, _ in aggs:
            if kind not in _KINDS:
                raise ValueError(f"unsupported aggregate {kind!r} for {out!r}")
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

    def _partial(self, batch: DataFrame) -> DataFrame:
        exprs = []
        for out, kind, col in self.aggs:
            if kind == "count":
                exprs.append(F.count(F.lit(1)).cast("long").alias(out))
            elif kind == "approx_distinct":
                exprs.append(F.hll_sketch_agg(col).alias(out))
            else:
                agg = {"sum": F.sum, "min": F.min, "max": F.max}[kind]
                field = self.table.schema[out].dataType
                exprs.append(agg(F.col(col).cast(field)).cast(field).alias(out))
        return batch.groupBy(*self.key_cols).agg(*exprs)

    def _merge_col(self, out: str, kind: str) -> F.Column:
        a, b = F.col(f"s.{out}"), F.col(f"p.{out}")
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

    def apply_batch(self, batch: DataFrame, batch_id: int) -> bool:
        """Merge one micro-batch into the state; returns False (no-op) for
        an already-applied batch id (at-least-once replay)."""
        if batch_id <= self.last_applied():
            return False
        partial = self._partial(batch).alias("p")
        state = self.table.read().alias("s")
        keys = [
            F.coalesce(F.col(f"s.{k}"), F.col(f"p.{k}")).alias(k)
            for k in self.key_cols
        ]
        merged = state.join(partial, on=self.key_cols, how="full_outer").select(
            *keys, *[self._merge_col(out, kind) for out, kind, _ in self.aggs]
        )
        self.table.overwrite(merged, meta={"last_batch": batch_id})
        return True

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
