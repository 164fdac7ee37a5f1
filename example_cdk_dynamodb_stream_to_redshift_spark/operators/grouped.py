"""Grouped-map operators (``applyInPandas``): whole-group Python kernels.

This is the third Pandas-UDF flavor the engine exercises (scalar
``pandas_udf`` → simhash/SRP signatures; ``mapInPandas`` → multimodal
kernels; ``applyInPandasWithState`` → streaming state). Grouped-map is the
escape hatch for per-group algorithms that genuinely need the WHOLE group
in memory at once — model fits, group-local normalization, per-entity
resampling — where window functions would need many passes.

Scale contract: one shuffle on the group key; each group must fit in one
task's memory (Arrow-batched). Skewed group sizes are the failure mode —
pre-split giant groups (salting) or fall back to window expressions when
the per-group computation is expressible incrementally.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def standardize_within_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score of ``value_col``: (x - mean) / std(population),
    0.0 for single-row or constant groups. The canonical grouped-map
    shape; tests pin it against the equivalent Window-expression plan
    (which is the better plan when, as here, the kernel IS expressible
    incrementally — this operator exists as the template for ones that
    are not)."""
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype("float64")
        std = x.std(ddof=0)
        pdf[out_col] = 0.0 if (std == 0 or pd.isna(std)) else (x - x.mean()) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(kernel, schema)


def standardize_within_group_native(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """The same semantics as a pure Window-expression plan — the form to
    prefer whenever the kernel is incremental: stays in codegen, no
    Python boundary, and tolerates arbitrarily large groups (no
    whole-group materialization)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col)
    x = F.col(value_col).cast("double")
    mean = F.avg(x).over(w)
    std = F.stddev_pop(x).over(w)
    return df.withColumn(
        out_col,
        F.when(std.isNull() | (std == 0), F.lit(0.0)).otherwise((x - mean) / std),
    )
