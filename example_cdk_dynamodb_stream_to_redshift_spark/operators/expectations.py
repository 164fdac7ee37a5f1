"""Declarative data-quality expectations — the gate a training pipeline
runs before consuming a table (the Deequ/Great-Expectations shape,
re-expressed as ONE Spark aggregation).

Design rule: every row-level constraint compiles to a conditional
aggregate over the SAME scan, so a suite of N checks costs one pass
over the table regardless of N — never N passes (the scan-census
lesson applied at the API level). Uniqueness folds into the same
aggregate via count(distinct); referential integrity is the one
constraint that inherently needs a second relation and compiles to a
broadcast-able left-anti count.

Two consumption modes:

- ``validate(df, checks)``: a tiny (one row per check) report —
  violations, row count, pass/fail — the artifact a pipeline logs and
  alerts on.
- ``split_violations(df, checks)``: (clean, flagged) row sets; flagged
  rows carry the array of failed check names — the quarantine path
  (same posture as the CDC dead-letter table), one projection each,
  no shuffle.

Reference tie-in: the reference trusts its stream blindly; this is the
engine's generalization of its quarantine/abort-guard instincts
(sources/cdc_envelope.py dead-letter table, merge.py ST8 guard) to
arbitrary declarative table contracts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation. ``predicate`` is a per-row boolean Column (True =
    row conforms); ``distinct_cols`` instead marks a uniqueness check
    over those columns (no per-row predicate exists for it)."""

    name: str
    predicate: Column | None = None
    distinct_cols: tuple[str, ...] | None = None


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Check:
    """NULL-tolerant range check: NULLs are not range violations —
    combine with not_null to forbid them."""
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})", c.isNull() | ((c >= lo) & (c <= hi))
    )


def accepted_values(col: str, values: list) -> Check:
    c = F.col(col)
    return Check(
        f"accepted_values({col})", c.isNull() | c.isin(*values)
    )


def matches(col: str, regex: str) -> Check:
    c = F.col(col)
    return Check(f"matches({col})", c.isNull() | c.rlike(regex))


def satisfies(name: str, predicate: Column) -> Check:
    """Escape hatch: any boolean Column expression as a named check."""
    return Check(name, predicate)


def unique(*cols: str) -> Check:
    return Check(f"unique({','.join(cols)})", None, tuple(cols))


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(check, n_rows, violations, passed) — one row per check, computed
    in ONE aggregation over one scan (uniqueness adds distinct-agg
    expansion on the same scan, never a second table read).

    Row-level violations = rows where the predicate is false;
    uniqueness violations = n_rows_with_key - n_distinct_keys (rows
    beyond the first per duplicated key; rows with any NULL key column
    are excluded, matching SQL UNIQUE semantics).

    An empty suite yields an empty (zero-row) report — an explode of
    zero structs is an analysis error, and callers composing suites
    dynamically shouldn't have to special-case "no checks"."""
    if not checks:
        return df.sparkSession.createDataFrame(
            [],
            "check string, n_rows bigint, violations bigint, passed boolean",
        )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for i, ck in enumerate(checks):
        if ck.distinct_cols is not None:
            keyed = [F.col(c) for c in ck.distinct_cols]
            non_null = None
            for c in ck.distinct_cols:
                cond = F.col(c).isNotNull()
                non_null = cond if non_null is None else (non_null & cond)
            aggs.append(
                F.count(F.when(non_null, F.lit(1))).cast("bigint").alias(f"_k{i}")
            )
            aggs.append(
                F.count_distinct(*keyed).cast("bigint").alias(f"_d{i}")
            )
        else:
            aggs.append(
                F.sum(
                    F.when(~ck.predicate, F.lit(1)).otherwise(F.lit(0))
                )
                .cast("bigint")
                .alias(f"_v{i}")
            )
    totals = df.agg(*aggs)
    rows = []
    for i, ck in enumerate(checks):
        if ck.distinct_cols is not None:
            viol = F.col(f"_k{i}") - F.col(f"_d{i}")
        else:
            viol = F.coalesce(F.col(f"_v{i}"), F.lit(0))
        rows.append(
            F.struct(
                F.lit(ck.name).alias("check"),
                F.col("_n").alias("n_rows"),
                viol.cast("bigint").alias("violations"),
                (viol == 0).alias("passed"),
            )
        )
    return totals.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.check", "r.n_rows", "r.violations", "r.passed"
    )


def split_violations(
    df: DataFrame, checks: list[Check]
) -> tuple[DataFrame, DataFrame]:
    """(clean, flagged): rows failing any ROW-LEVEL check are flagged
    with the array of failed check names (uniqueness checks are
    table-level and don't participate — use validate for those). Both
    sides are projections over the source scan: no shuffle, no second
    pass; at 100 TB this is the per-row gate that feeds the clean side
    into training and the flagged side into a quarantine table."""
    row_checks = [c for c in checks if c.predicate is not None]
    if not row_checks:
        # no row-level checks: everything is clean; flagged keeps the
        # declared shape (source columns + empty failed_checks)
        flagged = df.withColumn(
            "failed_checks", F.array().cast("array<string>")
        ).limit(0)
        return df, flagged
    failed = F.array_compact(
        F.array(
            *[
                F.when(~c.predicate, F.lit(c.name)) for c in row_checks
            ]
        )
    )
    tagged = df.withColumn("_failed_checks", failed)
    clean = tagged.filter(F.size("_failed_checks") == 0).drop("_failed_checks")
    flagged = tagged.filter(F.size("_failed_checks") > 0).withColumnRenamed(
        "_failed_checks", "failed_checks"
    )
    return clean, flagged


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_col: str,
    parent_col: str,
) -> DataFrame:
    """(check, n_rows, violations, passed) for the FK constraint "every
    non-null child.child_col exists in parent.parent_col". The one
    expectation that needs a second relation: a left-anti equi-join
    (broadcast when the parent's key set is small — the dimension-table
    case), counting orphans."""
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(keys, child_col, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
    )
    n = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    return orphans.crossJoin(n).select(
        F.lit(f"referential_integrity({child_col})").alias("check"),
        "n_rows",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )
