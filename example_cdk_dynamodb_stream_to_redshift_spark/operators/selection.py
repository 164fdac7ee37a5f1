"""Token-budget corpus selection: keep the highest-quality documents
until a token budget is exhausted — the core data-constrained-training
op ("we can afford B tokens; take the best B tokens' worth of docs").

Semantics (the contract both implementations and the DuckDB oracle
share): order eligible rows by ``(score DESC, tiebreak ASC)``, keep a
row iff the running total of ``weight`` *including that row* is
``<= budget``. Weights are non-negative (enforced — see below)
INTEGERS — token counts, the unit the budget is measured in; a
fractional weight column is rejected at plan-construction time rather
than silently truncated (the cumulative sum must be exact and
order-independent across engines, which floor(double) is not). So the
running total is monotone and the kept set is a PREFIX of the quality
ordering — this is "fill to budget", not skip-and-continue knapsack.
Rows with a NULL or NaN score, or a NULL weight, are excluded up front
(a doc with no score cannot be ranked; NaN would otherwise sort above
every real score under Spark's NaN-greatest rule and silently win the
budget).

Two implementations, pinned equal in tests/test_selection.py:

- ``budget_select_exact`` — the semantic definition verbatim: ONE
  global window cumsum. Correct anywhere, but the window is a total
  order: Spark moves every row to a single partition, and at 100 TB
  that plan simply does not run (measured: 115s at 50M rows where the
  scale path takes 3.4s, 2.9s warm — SCALE.md round 9).

- ``budget_select`` — the scale path, ONE lazy query (the
  quality_trim join-back shape, operators/curation.py): a histogram of
  ``weight`` by DECLARED score buckets (one scan, map-side partials,
  <= bins+1 groups) feeds a tiny exclusive-cumsum window that locates
  the BOUNDARY bucket — the one where the cumulative budget crosses —
  as a ONE-ROW control frame, broadcast onto the corpus. Rows below
  the boundary bucket are dropped map-side; survivors flow through ONE
  window cumsum PARTITIONED BY the bucket index, and one disjunctive
  filter keeps full buckets unconditionally while cutting the boundary
  bucket row-exactly at ``within-bucket cum + weight-above <= budget``.
  Bucket membership is a function of the score alone and the kept
  bucket-prefix is contiguous, so the result is bit-identical to the
  global window. Everything — histogram, walk, cut — is one consistent
  query: no driver-side collect, no build-time Spark job, no stale
  boundary if the source changes between plan construction and action.

  Cost shape (r13 rework): the corpus is scanned exactly TWICE
  (histogram + survivors) — the previous two-branch union re-planned
  the control subtree and the eligibility scan under each branch
  (column pruning specialized them, so ReusedExchange could never
  fire), costing FOUR corpus scans and two boundary locators. The
  survivor shuffle is bounded: buckets strictly above the boundary
  carry <= budget total weight by the crossing definition, and the
  boundary bucket is ~corpus/bins rows — the exact bound the old
  boundary-only sort had, since a window partition is a per-key sort
  (the boundary bucket is one key either way).

Bucket edges are declared by the caller (same philosophy as
operators/drift.py: deriving them per-run would make the plan shape
data-dependent). For a score in [0, 1], ``uniform_edges(32)`` is fine;
finer edges shrink the boundary sort, they never change the result.
The bucket index is the shared binary-search CASE emission
(``operators/drift.bucket_index_expr`` — O(log bins)/row; the O(bins)
boolean-cast chain measurably dominated every scan, SCALE.md).

Cost model caveats (measured, SCALE.md): (1) ``budget_select``
evaluates the score expression in each of its passes (histogram + two
filter branches). When the score is an expensive derived projection
(regex / HOF chains), select from a MATERIALIZED scored table — the
realistic pipeline shape anyway (score once, select many times; see
``doc_quality_scored_frozen``) — or use ``budget_select_exact`` below
~1M rows, where a global sort is cheaper than re-scoring. (2) The
boundary is a joined scalar, not a literal, so the branch predicates
evaluate post-scan rather than as parquet pushed filters; on a
score-clustered layout where min/max file skipping matters, run the
control query first and re-filter by literal yourself.

Reference tie-in: the reference's reports rank and cap by aggregates
(sql/queries.sql:8,19 ORDER BY .. LIMIT); this is the corpus-curation
generalization — a LIMIT measured in tokens, not rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .drift import bucket_index_expr

_CUM = "__budget_cum__"
_BUCKET = "__budget_bucket__"
_BOUNDARY = "__budget_boundary__"
_OFFSET = "__budget_offset__"


def _work_name(df: DataFrame, base: str) -> str:
    """Collision-proof working-column name (the caller's frame may
    legitimately carry e.g. a ``__budget_cum__`` from an earlier pass)."""
    name = base
    while name in df.columns:
        name += "_"
    return name


def uniform_edges(bins: int, lo: float = 0.0, hi: float = 1.0) -> tuple[float, ...]:
    """``bins`` equal-width interior edges over (lo, hi), exclusive of
    both ends — suitable for a score with a known range."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    step = (hi - lo) / (bins + 1)
    return tuple(lo + step * i for i in range(1, bins + 1))


def _require_integral_weight(df: DataFrame, weight_col: str) -> None:
    """Weights are token counts: the budget cumsum must be exact, so a
    fractional weight type (float/double/decimal-with-scale) is a
    caller bug — the old behavior silently selected against
    floor(weight), consistently across both Spark paths but diverging
    from the documented cum-sum-of-weight semantics, so no test could
    catch it downstream. Schema-only check, zero data cost."""
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        IntegerType,
        LongType,
        ShortType,
    )

    dt = df.schema[weight_col].dataType
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return
    if isinstance(dt, DecimalType) and dt.scale == 0:
        return
    raise TypeError(
        f"weight column {weight_col!r} must be an integral type (token "
        f"counts — the unit the budget is measured in); got "
        f"{dt.simpleString()}. Cast explicitly if truncation is really "
        "intended."
    )


def _eligible(df: DataFrame, score_col: str, weight_col: str) -> DataFrame:
    s, w = F.col(score_col), F.col(weight_col)
    return df.filter(
        s.isNotNull() & ~F.isnan(s.cast("double")) & w.isNotNull()
    )


def _order(score_col: str, tiebreak_col: str) -> list[Column]:
    return [F.desc(score_col), F.asc(tiebreak_col)]


def budget_select_exact(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    tiebreak_col: str,
) -> DataFrame:
    """The semantic definition: global window cumsum over
    ``(score DESC, tiebreak ASC)``, keep while ``cum <= budget``.
    Explicit ROWS frame so ties (impossible when tiebreak is a key, but
    cheap to pin) never flip to RANGE peer-aggregation."""
    _require_integral_weight(df, weight_col)
    cum = _work_name(df, _CUM)
    win = (
        Window.orderBy(*_order(score_col, tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = _eligible(df, score_col, weight_col).withColumn(
        cum, F.sum(F.col(weight_col).cast("long")).over(win)
    )
    return out.filter(F.col(cum) <= F.lit(int(budget))).drop(cum)


def weight_histogram(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    edges: tuple[float, ...],
) -> DataFrame:
    """``(bucket, w, wmin)`` over ``df``'s eligible rows — the public
    contract of ``budget_select(hist=...)`` and the per-batch unit of
    the maintained store (streaming/selection_maintenance). One scan,
    map-side partials, <= len(edges)+1 groups. The algebra is EXACT
    under union — sums add, mins min — so per-slice histograms summed
    bucket-wise equal the histogram of the union, regardless of
    slicing."""
    _require_integral_weight(df, weight_col)
    edges = tuple(sorted(float(e) for e in edges))
    elig = _eligible(df, score_col, weight_col)
    w_long = F.col(weight_col).cast("long")
    return elig.groupBy(
        bucket_index_expr(score_col, edges).alias("bucket")
    ).agg(F.sum(w_long).alias("w"), F.min(w_long).alias("wmin"))


def budget_select(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    tiebreak_col: str,
    edges: tuple[float, ...],
    hist: DataFrame | None = None,
) -> DataFrame:
    """Scale-path selection, bit-equal to ``budget_select_exact``:
    histogram -> boundary-bucket control row (broadcast) -> map-side
    drop of sub-boundary rows -> one bucket-partitioned window cumsum
    -> one disjunctive cut, all in ONE lazy query. No window partition
    ever exceeds max(bucket size) ~ corpus/len(edges) rows, and the
    kept full buckets total <= budget weight by construction.

    ``hist`` replaces the internal histogram pass with a PRECOMPUTED
    ``(bucket, w, wmin)`` frame — ``bucket`` must be
    ``count(edges <= score)`` under these same ``edges`` over exactly
    this frame's eligible rows, or the cutoff is silently wrong. The
    incrementally maintained store
    (streaming/selection_maintenance.BudgetHistogram) satisfies the
    contract by construction, which removes the histogram's corpus scan
    entirely: selection over a streamed-in corpus pays only the two
    branch scans.

    Non-negative weights are a precondition of the monotone-prefix
    argument; a negative weight raises at action time (the check rides
    the control row, so it costs one comparison on a bins-sized frame,
    not a data pass). Integral weights are a precondition of exactness
    and raise at plan-construction time (module docstring).
    """
    _require_integral_weight(df, weight_col)
    budget = int(budget)
    # bucket id is count(edges <= score) — order-independent — but the
    # binary-search emission needs the edge list sorted
    edges = tuple(sorted(float(e) for e in edges))
    elig = _eligible(df, score_col, weight_col)
    idx = bucket_index_expr(score_col, edges)
    w_long = F.col(weight_col).cast("long")

    if hist is None:
        # Histogram: <= len(edges)+1 groups, map-side partials, one scan.
        hist = weight_histogram(df, score_col, weight_col, edges)
    hist = hist.select(
        F.col("bucket").cast("int").alias(_BUCKET),
        F.col("w").cast("long").alias("w"),
        F.col("wmin").cast("long").alias("wmin"),
    )
    # Exclusive cumsum of the weight ABOVE each bucket (higher score
    # first) over the tiny histogram frame. Weights >= 0 make `above`
    # monotone as the bucket id descends, so the boundary bucket — the
    # unique one where the budget crosses — is `above <= budget <
    # above + w`; every bucket above it is fully kept, every bucket
    # below is unreachable.
    hw = Window.orderBy(F.desc(_BUCKET)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.withColumn("above", F.coalesce(F.sum("w").over(hw), F.lit(0)))
    # `above <= max(budget, 0)` rather than `<= budget`: with a negative
    # budget no bucket is full and the boundary must be the TOPMOST
    # bucket (above == 0) so the edge window drops everything — matching
    # budget_select_exact's empty result. For budget >= 0 the clamp is a
    # no-op and the crossing bucket is unique (above monotone).
    crossing = (F.col("above") <= max(budget, 0)) & (
        F.col("above") + F.col("w") > budget
    )
    bnd = _work_name(df, _BOUNDARY)
    off = _work_name(df, _OFFSET)
    ctl = cum.agg(
        F.max(F.when(crossing, F.col(_BUCKET))).alias("b"),
        F.max(F.when(crossing, F.col("above"))).alias("a"),
        F.min("wmin").alias("wmin"),
    ).select(
        # the negative-weight guard rides the control row: both branch
        # predicates consume the boundary, so it always evaluates
        F.when(
            F.col("wmin") < 0,
            F.raise_error(
                F.lit("budget_select requires non-negative weights")
            ),
        )
        .otherwise(F.coalesce(F.col("b"), F.lit(-1)))
        .alias(bnd),
        F.coalesce(F.col("a"), F.lit(0)).cast("long").alias(off),
    )

    # SINGLE-REFERENCE tail (r13): every row consumes the broadcast
    # control row exactly once — a two-branch union here re-plans (and
    # re-executes) the control subtree and the eligibility scan per
    # branch, because column pruning specializes the copies past
    # ReusedExchange's reach (measured: 4 corpus scans, 2 boundary
    # locators). Survivors of the map-side bucket cut flow through one
    # window PARTITIONED BY the bucket index: the boundary bucket's
    # partition computes the exact within-bucket cumsum (same row set,
    # same ordering as the old boundary-only window), while full
    # buckets pass the disjunctive filter unconditionally — their cum
    # value is never read.
    bucket_col = _work_name(df, _BUCKET)
    cum_col = _work_name(df, _CUM)
    joined = (
        elig.withColumn(bucket_col, idx)
        .crossJoin(F.broadcast(ctl))  # ONE-row control frame
        .filter(F.col(bucket_col) >= F.col(bnd))
    )
    win = (
        Window.partitionBy(bucket_col)
        .orderBy(*_order(score_col, tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(cum_col, F.sum(w_long).over(win) + F.col(off))
        .filter(
            (F.col(bucket_col) > F.col(bnd))
            | (F.col(cum_col) <= F.lit(budget))
        )
        .drop(bucket_col, cum_col, bnd, off)
    )
