"""Corpus curation operators: deterministic split assignment and
histogram-boundary quality trimming — the two gatekeeping steps between
"cleaned corpus" and "training shards".

Scale design:
- assign_split: the split is a pure per-row projection on a CONTENT hash
  (md5 lane mod 100) — no shuffle, no state, and re-ingesting the same
  document (different file, different day, different row order) lands it
  in the same split every time. Hashing an ingest-order id would silently
  reassign splits on every backfill; hashing content is the
  reproducibility contract training pipelines actually need.
- quality_trim: per-group threshold selection runs on the score
  HISTOGRAM (groupBy(group, score) count — thousands of rows), never on
  the corpus: cumulative counts over the tiny histogram pick the cut
  score, which broadcast-joins back as a filter. The corpus-side plan is
  scan -> broadcast join -> filter: no window over data, no sort, no
  skew surface. Integer scores + count arithmetic make the threshold
  bit-identical across engines (no interpolated-quantile float drift).

Reference scope: beyond the reference app; training-data-pipeline family
per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SPLIT_BUCKETS = 100


def split_bucket(content_col: str) -> F.Column:
    """Deterministic 0..99 bucket from the first 32-bit md5 lane of the
    content — same integer in DuckDB via ('0x' || substr(md5(c),1,8))::UBIGINT."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(content_col)), 1, 8), 16, 10).cast("long"),
        F.lit(SPLIT_BUCKETS),
    )


def assign_split(
    df: DataFrame,
    content_col: str = "text",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test') by content-hash
    bucket: [0, train) -> train, [train, train+val) -> val, rest test."""
    if not 0 < train_pct + val_pct <= SPLIT_BUCKETS:
        raise ValueError("train_pct + val_pct must be in (0, 100]")
    b = split_bucket(content_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def quality_trim(
    df: DataFrame,
    score_col: str,
    group_col: str,
    keep_num: int = 9,
    keep_den: int = 10,
) -> DataFrame:
    """Keep each group's top ~keep_num/keep_den rows by integer score,
    cutting at a score-histogram boundary (never inside a tie): the
    threshold is the LARGEST score t with count(score >= t) >=
    ceil(n * keep_num / keep_den), so at least the keep fraction
    survives and equal-scored rows share a fate. The target count is
    pure integer arithmetic — ``ceil(0.9 * n)`` in doubles returns 10
    for n = 10 (0.9*10 rounds up), a cross-engine landmine this avoids.
    Returns df rows with score >= t."""
    if not 0 < keep_num <= keep_den:
        raise ValueError("keep_num/keep_den must be a fraction in (0, 1]")
    hist = df.groupBy(group_col, score_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).desc())
    wg = Window.partitionBy(group_col)
    target = F.expr(f"(n * {keep_num} + {keep_den} - 1) div {keep_den}")
    thresholds = (
        hist.withColumn("cum_ge", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(wg))
        .filter(F.col("cum_ge") >= target)
        .groupBy(group_col)
        .agg(F.max(score_col).alias("_thresh"))
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(F.col(score_col) >= F.col("_thresh"))
        .drop("_thresh")
    )
