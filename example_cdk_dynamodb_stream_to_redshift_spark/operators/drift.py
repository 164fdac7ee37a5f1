"""Distribution-drift detection: per-column histogram profiles and
Population Stability Index (PSI) against a baseline — the monitor a
training-data pipeline runs on every ingested slice to catch corpus
shift before it poisons a model.

Design language matches operators/expectations.py: a profile over N
columns compiles to ONE conditional aggregation over ONE scan of the
table (never a pass per column), producing a tiny long-format
``(column, bucket, cnt)`` table — the persistable artifact. Drift
scoring then never touches the data again: PSI is a join of two
profile tables, kilobytes each, broadcast for free.

Bucketing is DECLARED, not derived: numeric columns carry explicit bin
edges and categorical columns an explicit category list (everything
else lands in ``__other__``), so the current slice and the baseline are
bucketed identically by construction — deriving edges from each slice
separately is the classic drift-monitor bug (the comparison shifts with
the data it is supposed to judge). Edges/categories come from profiling
a reference corpus once (``suggest_edges``) and are then frozen.

PSI per column: sum over buckets of (p_cur - p_base) * ln(p_cur /
p_base), with both shares floored at ``eps`` so empty buckets do not
produce infinities. Conventional reading: < 0.1 stable, 0.1-0.2
moderate shift, > 0.2 drifted (Siddiqi 2006, credit-scorecard
monitoring practice). The numerics are pinned against an independent
numpy reference in tests/test_drift.py.

Scale shape at 100 TB: the profile pass is the only thing that sees the
data — one scan, map-side partial aggregation of cols x buckets
counters, one bounded-key shuffle. Everything downstream (PSI, the
drift verdict, dashboards) reads profile tables. NULL handling is
explicit: nulls are a bucket (``__null__``), not an omission — a column
going 0% -> 30% null IS drift and must move the score. NaN likewise
gets its own bucket (``__nan__``) rather than riding Spark's
NaN-sorts-greatest rule into the top bin.

Reference tie-in: the reference trusts its stream blindly; this extends
the engine's observability family (sync-run log, expectation suites,
quality gate) from row contracts to DISTRIBUTIONS.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NULL_BUCKET = "__null__"
NAN_BUCKET = "__nan__"
OTHER_BUCKET = "__other__"


@dataclass(frozen=True)
class NumericProfile:
    """Equi-comparable histogram spec: ``edges`` are the INTERIOR bin
    boundaries (len k => k+1 bins, the outer bins unbounded). A value v
    lands in bucket i = count(edges <= v) — left-closed bins
    ``(-inf,e0) [e0,e1) ... [ek,inf)``.

    Edges are NORMALIZED to float on construction: bucket LABELS embed
    the edge repr, and a baseline frozen from int-spelled edges (e.g.
    round-tripped through JSON) must produce the identical label set as
    a float-spelled monitoring spec, or the PSI join matches nothing
    and every bucket reads as total drift (r8 review finding)."""

    col: str
    edges: tuple[float, ...]

    def __post_init__(self):
        norm = tuple(float(e) for e in self.edges)
        object.__setattr__(self, "edges", norm)
        if not norm or list(norm) != sorted(set(norm)):
            raise ValueError(
                f"{self.col}: edges must be non-empty, sorted, unique — "
                f"got {self.edges!r}"
            )


@dataclass(frozen=True)
class CategoricalProfile:
    """Declared category domain; values outside it collapse into
    ``__other__`` (a NEW category appearing upstream shows up as
    ``__other__`` growth — itself a drift signal)."""

    col: str
    categories: tuple[str, ...]

    def __post_init__(self):
        if not self.categories or len(set(self.categories)) != len(
            self.categories
        ):
            raise ValueError(
                f"{self.col}: categories must be non-empty and unique"
            )


ProfileSpec = NumericProfile | CategoricalProfile


def _numeric_labels(edges: tuple[float, ...]) -> list[str]:
    """THE single source of numeric bucket labels — _bucket_expr and
    _buckets_of must emit identical strings or profile() produces
    buckets the full-support enumeration never materializes (the PSI
    join-mismatch failure class). Edges are already float-normalized by
    NumericProfile, so repr() is deterministic."""
    labels = []
    lo = "-inf"
    for e in edges:
        labels.append(f"[{lo},{repr(e)})")
        lo = repr(e)
    labels.append(f"[{lo},inf)")
    return labels


def bucket_index_expr(col: Column | str, edges: tuple[float, ...]) -> Column:
    """Bucket index = count(edges <= value) for SORTED unique edges,
    emitted as a balanced binary-search CASE tree of depth
    log2(len(edges)). Spark evaluates only the taken CASE branch per
    row, so this costs O(log bins) comparisons/row where the
    boolean-cast chain it replaced was O(bins) — a measured 3.3x on a
    whole selection pass at 64 edges x 5M rows (SCALE.md round 9).
    Shared by drift profiles and token-budget selection
    (operators/selection.py). Callers guard NaN and NULL themselves:
    NaN takes every >= branch under Spark's NaN-greatest rule and lands
    in the TOP bucket; NULL fails every >= comparison (NULL is false in
    CASE) and lands in bucket 0 — unlike the boolean-cast chain this
    replaced, a NULL input does NOT propagate to a NULL index."""
    c = F.col(col) if isinstance(col, str) else col

    def go(lo: int, hi: int) -> Column:
        # the count of edges <= value is known to lie in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(c >= F.lit(float(edges[mid])), go(mid + 1, hi)).otherwise(
            go(lo, mid)
        )

    return go(0, len(edges))


def _bucket_expr(spec: ProfileSpec) -> Column:
    c = F.col(spec.col)
    if isinstance(spec, NumericProfile):
        # bucket label = the bin's half-open range, indexed by the
        # shared binary-search emission (edges sorted by __post_init__)
        idx = bucket_index_expr(c, spec.edges)
        labels = _numeric_labels(spec.edges)
        label = F.element_at(
            F.array(*[F.lit(lab) for lab in labels]), idx + F.lit(1)
        )
        # NaN gets its OWN bucket, not the top bin: Spark orders NaN
        # greater than any number, so every `c >= edge` comparison is
        # true and a column shifting 0% -> 30% NaN would read as
        # top-bin growth, conflated with genuine high-value drift
        # (ADVICE r8). The isnan probe runs on a double cast so integer
        # columns (which cannot hold NaN) stay valid inputs.
        return (
            F.when(c.isNull(), F.lit(NULL_BUCKET))
            .when(F.isnan(c.cast("double")), F.lit(NAN_BUCKET))
            .otherwise(label)
        )
    known = c.cast("string").isin(*spec.categories)
    return (
        F.when(c.isNull(), F.lit(NULL_BUCKET))
        .when(known, c.cast("string"))
        .otherwise(F.lit(OTHER_BUCKET))
    )


def _buckets_of(spec: ProfileSpec) -> list[str]:
    if isinstance(spec, NumericProfile):
        return _numeric_labels(spec.edges) + [NAN_BUCKET, NULL_BUCKET]
    return list(spec.categories) + [OTHER_BUCKET, NULL_BUCKET]


def profile(df: DataFrame, specs: list[ProfileSpec]) -> DataFrame:
    """(column, bucket, cnt): histogram counts for every spec, computed
    in ONE aggregation over ONE scan (plan-asserted in tests). Every
    declared bucket appears, zero-count included — PSI needs the full
    support on both sides, and a bucket silently missing from one
    profile is exactly the bug the declared-bucketing design exists to
    prevent."""
    if not specs:
        return df.sparkSession.createDataFrame(
            [], "column string, bucket string, cnt bigint"
        )
    names = [s.col for s in specs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate columns in specs: {names}")
    aggs = []
    for i, spec in enumerate(specs):
        b = _bucket_expr(spec)
        for j, bucket in enumerate(_buckets_of(spec)):
            aggs.append(
                F.sum((b == F.lit(bucket)).cast("bigint")).alias(f"_c_{i}_{j}")
            )
    totals = df.agg(*aggs)
    rows = []
    for i, spec in enumerate(specs):
        for j, bucket in enumerate(_buckets_of(spec)):
            rows.append(
                F.struct(
                    F.lit(spec.col).alias("column"),
                    F.lit(bucket).alias("bucket"),
                    F.coalesce(F.col(f"_c_{i}_{j}"), F.lit(0))
                    .cast("bigint")
                    .alias("cnt"),
                )
            )
    return totals.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.column", "r.bucket", "r.cnt"
    )


def _psi_from_joined(
    joined: DataFrame,
    group_cols: list[str],
    eps: float,
    drift_threshold: float,
) -> DataFrame:
    """Shared PSI arithmetic over a (group_cols..., bucket, cnt_cur,
    cnt_base) frame — used by psi_report (group = column) and the
    streaming trend (group = batch_id, column) so the numerics live in
    exactly one place.

    EMPTY-SIDE RULE (r8 review finding): a group with n_current == 0 or
    n_baseline == 0 has no distribution to compare — every share floors
    to eps and PSI saturates at a huge constant, which turned every
    idle/empty micro-batch into a full-columns drift alert. Such groups
    report psi = NULL, drifted = false; the n_* columns still say WHY."""
    totals = joined.groupBy(*group_cols).agg(
        F.sum("cnt_cur").alias("n_current"), F.sum("cnt_base").alias("n_baseline")
    )
    shared = joined.join(F.broadcast(totals), group_cols)
    p_cur = F.greatest(
        F.col("cnt_cur") / F.greatest(F.col("n_current"), F.lit(1)),
        F.lit(float(eps)),
    )
    p_base = F.greatest(
        F.col("cnt_base") / F.greatest(F.col("n_baseline"), F.lit(1)),
        F.lit(float(eps)),
    )
    term = (p_cur - p_base) * F.log(p_cur / p_base)
    both_sides = (F.col("n_current") > 0) & (F.col("n_baseline") > 0)
    return (
        shared.groupBy(*group_cols, "n_current", "n_baseline")
        .agg(F.sum(term).alias("_psi_raw"))
        .select(
            *group_cols,
            F.when(both_sides, F.col("_psi_raw")).alias("psi"),
            "n_current",
            "n_baseline",
            (
                both_sides & (F.col("_psi_raw") > F.lit(float(drift_threshold)))
            ).alias("drifted"),
        )
    )


def psi_report(
    current: DataFrame,
    baseline: DataFrame,
    eps: float = 1e-6,
    drift_threshold: float = 0.2,
) -> DataFrame:
    """(column, psi, n_current, n_baseline, drifted) from two profile
    tables — the data is never rescanned; the inputs are kilobyte
    (cols x buckets) frames so the join cost is nil (full-outer cannot
    broadcast, so the plan is a tiny sort-merge — fine at this size).
    Bucket shares are floored at ``eps`` before the log so buckets empty
    on one side contribute a large-but-finite term. Columns are matched
    by (column, bucket); buckets present on only one side still
    contribute (the other side's count reads as 0 -> eps share) via the
    full outer join. A side with ZERO total rows for a column yields
    psi = NULL / drifted = false (see _psi_from_joined)."""
    cur = current.select(
        "column", "bucket", F.col("cnt").alias("cnt_cur")
    )
    base = baseline.select(
        "column", "bucket", F.col("cnt").alias("cnt_base")
    )
    joined = cur.join(base, ["column", "bucket"], "full_outer").select(
        "column",
        F.coalesce("cnt_cur", F.lit(0)).alias("cnt_cur"),
        F.coalesce("cnt_base", F.lit(0)).alias("cnt_base"),
    )
    return _psi_from_joined(joined, ["column"], eps, drift_threshold)


def suggest_edges(
    df: DataFrame, col: str, n_bins: int = 10, relative_error: float = 0.001
) -> tuple[float, ...]:
    """Derive interior edges from a REFERENCE corpus's quantiles (one
    approxQuantile pass, the Greenwald-Khanna sketch) — run ONCE when
    freezing a baseline, never per monitored slice. Duplicate quantiles
    (heavy point masses) collapse, so the returned edge count can be
    below n_bins-1."""
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = df.approxQuantile(col, qs, relative_error)
    return tuple(sorted(set(edges)))
