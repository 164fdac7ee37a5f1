"""Token-budget corpus selection: keep the highest-quality documents
until a token budget is exhausted — the core data-constrained-training
op ("we can afford B tokens; take the best B tokens' worth of docs").

Semantics (the contract both implementations and the DuckDB oracle
share): order eligible rows by ``(score DESC, tiebreak ASC)``, keep a
row iff the running total of ``weight`` *including that row* is
``<= budget``. Weights are non-negative, so the running total is
monotone and the kept set is a PREFIX of the quality ordering — this is
"fill to budget", not skip-and-continue knapsack. Rows with a NULL or
NaN score, or a NULL weight, are excluded up front (a doc with no score
cannot be ranked; NaN would otherwise sort above every real score under
Spark's NaN-greatest rule and silently win the budget).

Two implementations, pinned equal in tests/test_selection.py:

- ``budget_select_exact`` — the semantic definition verbatim: ONE
  global window cumsum. Correct anywhere, but the window is a total
  order: at 100 TB that is a full range-partitioned sort of the corpus
  just to find a cutoff.

- ``budget_select`` — the scale path. Pass 1 histograms ``weight`` by
  DECLARED score buckets (one scan, map-side partial agg, <= bins+1
  rows collected — an O(artifact) driver step, same posture as
  operators/drift.py profiles). The driver walk finds the boundary
  bucket where the cumulative budget crosses. Buckets strictly above it
  are kept with a pure FILTER (no sort — at 100 TB this is a
  predicate-pushed scan); only the boundary bucket (~corpus/bins rows)
  is window-sorted to place the cutoff row-exactly. Bucket membership
  is a function of the score alone, and the kept bucket-prefix is
  contiguous, so the union is bit-identical to the global window.

Bucket edges are declared by the caller (same philosophy as
operators/drift.py: deriving them per-run would make the plan shape
data-dependent). For a score in [0, 1], ``uniform_edges(32)`` is fine;
finer edges shrink the boundary sort, they never change the result.

Reference tie-in: the reference's reports rank and cap by aggregates
(sql/queries.sql:8,19 ORDER BY .. LIMIT); this is the corpus-curation
generalization — a LIMIT measured in tokens, not rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_CUM = "__budget_cum__"
_BUCKET = "__budget_bucket__"


def uniform_edges(bins: int, lo: float = 0.0, hi: float = 1.0) -> tuple[float, ...]:
    """``bins`` equal-width interior edges over (lo, hi), exclusive of
    both ends — suitable for a score with a known range."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    step = (hi - lo) / (bins + 1)
    return tuple(lo + step * i for i in range(1, bins + 1))


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
    win = (
        Window.orderBy(*_order(score_col, tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = _eligible(df, score_col, weight_col).withColumn(
        _CUM, F.sum(F.col(weight_col).cast("long")).over(win)
    )
    return out.filter(F.col(_CUM) <= F.lit(int(budget))).drop(_CUM)


def _bucket_idx(score_col: str, edges: tuple[float, ...]) -> Column:
    """Bucket i = count(edges <= score): branch-free sum of boolean
    casts, same shape as operators/drift._bucket_expr. Higher bucket id
    == higher score range, so the quality ordering visits buckets in
    descending id order."""
    c = F.col(score_col)
    idx: Column = F.lit(0)
    for e in edges:
        idx = idx + (c >= F.lit(float(e))).cast("int")
    return idx


def budget_select(
    df: DataFrame,
    score_col: str,
    weight_col: str,
    budget: int,
    tiebreak_col: str,
    edges: tuple[float, ...],
) -> DataFrame:
    """Scale-path selection, bit-equal to ``budget_select_exact``:
    histogram pass -> driver boundary walk -> filter (full buckets) +
    boundary-bucket-only window. Only ~corpus/len(edges) rows are ever
    sorted; everything else is scans and one bounded-key aggregation.

    Requires non-negative weights (token counts are); negative weights
    would break the monotone-prefix argument both paths share.
    """
    budget = int(budget)
    edges = tuple(float(e) for e in edges)
    elig = _eligible(df, score_col, weight_col)
    idx = _bucket_idx(score_col, edges)
    w_long = F.col(weight_col).cast("long")

    # Pass 1: one scan, <= len(edges)+1 rows back to the driver.
    hist = (
        elig.groupBy(idx.alias(_BUCKET))
        .agg(F.sum(w_long).alias("w"))
        .collect()
    )
    bucket_w = {r[_BUCKET]: r["w"] for r in hist}

    # Driver walk, descending score buckets: full buckets while they
    # fit; the first that does not is the boundary. Because weights are
    # non-negative the kept prefix ends inside it — everything below is
    # unreachable (the running total is already past the budget).
    acc = 0
    boundary = None
    for b in sorted(bucket_w, reverse=True):
        if acc + bucket_w[b] <= budget:
            acc += bucket_w[b]
        else:
            boundary = b
            break

    if boundary is None:  # everything fits
        return elig

    full = elig.filter(idx > F.lit(boundary))  # pure filter, no sort
    win = (
        Window.orderBy(*_order(score_col, tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edge_rows = (
        elig.filter(idx == F.lit(boundary))
        .withColumn(_CUM, F.sum(w_long).over(win) + F.lit(acc))
        .filter(F.col(_CUM) <= F.lit(budget))
        .drop(_CUM)
    )
    return full.unionByName(edge_rows)
