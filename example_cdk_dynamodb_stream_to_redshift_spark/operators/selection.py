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

Cost model caveat (measured, SCALE.md): ``budget_select`` evaluates the
score expression in each of its passes (histogram + the two filter
branches). When the score is an expensive derived projection (regex /
HOF chains), select from a MATERIALIZED scored table — the realistic
pipeline shape anyway (score once, select many times; see
``doc_quality_scored_frozen``) — or use ``budget_select_exact`` below
~1M rows, where a global sort is cheaper than re-scoring. Over a
materialized scored corpus the scale path wins 36x at 50M rows and the
exact path's single-partition window stops being runnable long before
100 TB.

Reference tie-in: the reference's reports rank and cap by aggregates
(sql/queries.sql:8,19 ORDER BY .. LIMIT); this is the corpus-curation
generalization — a LIMIT measured in tokens, not rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_CUM = "__budget_cum__"
_BUCKET = "__budget_bucket__"


def _cum_col(df: DataFrame) -> str:
    """Collision-proof working-column name (the caller's frame may
    legitimately carry a ``__budget_cum__`` from an earlier pass)."""
    name = _CUM
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
    cum = _cum_col(df)
    win = (
        Window.orderBy(*_order(score_col, tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = _eligible(df, score_col, weight_col).withColumn(
        cum, F.sum(F.col(weight_col).cast("long")).over(win)
    )
    return out.filter(F.col(cum) <= F.lit(int(budget))).drop(cum)


def _bucket_idx(score_col: str, edges: tuple[float, ...]) -> Column:
    """Bucket i = count(edges <= score), emitted as a BALANCED binary
    search over the sorted edge list: a nested CASE tree of depth
    log2(len(edges)). Spark evaluates only the taken CASE branch per
    row, so this costs O(log bins) comparisons per row where the
    drift-style boolean-cast chain is O(bins) — a measured 3.3x on the
    whole selection pass at 64 edges x 5M rows (the chain dominated
    every scan: 15.2s -> 4.6s end-to-end). Higher bucket id == higher score range, so the quality
    ordering visits buckets in descending id order. Callers feed
    non-NaN scores (_eligible filters first): NaN would take every >=
    branch under Spark's NaN-greatest rule and land in the top bucket."""
    c = F.col(score_col)

    def go(lo: int, hi: int) -> Column:
        # the count of edges <= score is known to lie in [lo, hi]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(c >= F.lit(float(edges[mid])), go(mid + 1, hi)).otherwise(
            go(lo, mid)
        )

    return go(0, len(edges))


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
    # bucket id is count(edges <= score) — order-independent — but the
    # binary-search emission needs the edge list sorted
    edges = tuple(sorted(float(e) for e in edges))
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

    cum = _cum_col(df)
    full = elig.filter(idx > F.lit(boundary))  # pure filter, no sort
    win = (
        Window.orderBy(*_order(score_col, tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edge_rows = (
        elig.filter(idx == F.lit(boundary))
        .withColumn(cum, F.sum(w_long).over(win) + F.lit(acc))
        .filter(F.col(cum) <= F.lit(budget))
        .drop(cum)
    )
    return full.unionByName(edge_rows)
