"""Exact global ranking without the single-partition window trap.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the classic
scale killer: Spark moves the ENTIRE dataset into one task to satisfy the
unpartitioned window. But a total order doesn't need a single sorter —
global sorts already distribute via range partitioning (that's what
``orderBy`` compiles to), and a global row number is just
``local row number + sum of earlier partitions' counts``.

Plan shape:
1. ``repartitionByRange`` on the (unique) sort key — each partition holds
   a contiguous key range; partition i's keys all precede partition i+1's.
2. one tiny counting job: rows per partition (``<= num_partitions``
   driver scalars — the only thing that ever leaves the executors).
3. ``sortWithinPartitions`` + ``mapInPandas`` stamping
   ``offset[pid] + local_index`` — zero further shuffle; Arrow batches
   stream through in partition order.

The sort key must be made unique (append a tie-break id) — uniqueness is
what makes the rank reproducible across range-boundary placements, since
equal keys can otherwise straddle a boundary in sampling-dependent ways.

Used by the CCNet-style quality bucketing query (plans/inventory_ml.py),
whose DuckDB oracle is the plain unpartitioned window — same numbers, a
plan that survives 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lineage import truncate_lineage


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + ``out_col``: the exact 1-based global row number under
    ``order_cols`` (which MUST form a unique total order — include a
    tie-break key). No unpartitioned window anywhere in the plan."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # truncate_lineage (eager) FREEZES the range partitioning: the
    # RangePartitioner samples boundaries with a seed derived from the RDD
    # id, so a recompute after unpersist would re-sample DIFFERENT
    # boundaries and invalidate the driver-held offsets (duplicate /
    # out-of-range ranks). The counting pass and the stamping pass must
    # read the same materialized partitions — same pattern as
    # components.py / bpe.py iteration truncation.
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .transform(truncate_lineage)
    )
    counts = {
        r["pid"]: r["n"]
        for r in parts.groupBy(
            F.spark_partition_id().alias("pid")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets = []
    acc = 0
    for pid in range(max(counts, default=-1) + 1):
        offsets.append(acc)
        acc += counts.get(pid, 0)

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def stamp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = offsets[pid] + 1 if pid < len(offsets) else 1
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    return parts.mapInPandas(stamp, schema)
