"""Temperature-based mixture sampling — the multilingual / multi-source
rebalancing recipe used to build LLM training mixes (Conneau & Lample
2019 §3.1; XLM-R, mT5): group ``g`` holding ``n_g`` documents receives a
share of the output budget proportional to ``n_g ** alpha``. ``alpha=1``
keeps the corpus distribution; ``alpha -> 0`` flattens it toward uniform
(every group the same share); intermediate temperatures trade head-group
dominance against tail-group upsampling without ever oversampling a
group past its population.

Two deliberate departures from the usual "sample with probability p_g"
formulation, both in this engine's determinism idiom:

- **Targets are exact integers, not expectations.** ``mixture_targets``
  waterfills the budget over the groups (a group whose proportional
  share exceeds its population is given exactly its population and the
  residual budget is re-shared over the rest — at most ``|groups|``
  rounds), then rounds by largest remainder with a deterministic
  (fraction desc, group asc) tie-break. The targets always sum to
  ``min(budget, total)`` — no binomial noise, no "approximately B docs".
- **The per-group sample is the bottom-``target_g`` by hash, not
  rand().** Group ``g`` keeps its ``target_g`` md5-smallest distinct
  keys (operators/bottomk.py's order), so the mix is a PURE FUNCTION of
  the key population: re-runs, re-partitionings, and engine swaps
  reproduce it bit-for-bit, and growing the corpus perturbs the kept
  set minimally instead of reshuffling it. It also makes the mix
  answerable FROM A MAINTAINED SAMPLE STORE: the target_g smallest
  hashes are a prefix of the store's bottom-k whenever ``k >=
  target_g``, so ``mixture_from_sample`` re-mixes a streamed-in corpus
  at any (alpha, budget) from kilobyte state — zero corpus scans
  (streaming/sample_maintenance.BottomKSample is the store).

Scale shape (100 TB posture): ``mixture_sample_exact`` is the semantic
definition — one row_number window per group, i.e. a full sort of every
group's keys; correct, but the head group's sort dominates at scale.
``mixture_sample`` is the production path, bit-equal by construction
(pinned in tests/test_mixture.py): md5 is uniform, so bucketing keys by
the hash's first two hex chars yields 256 evenly-filled buckets per
group WITHOUT declaring data-dependent edges — a bounded-key
``(group, bucket)`` count histogram (map-side partials, one scan),
a per-group boundary bucket where the cumulative count crosses the
target (computed on the 256 x groups histogram frame, broadcast back),
full buckets kept by pure filter, and ONLY the ~n_g/256 boundary-bucket
rows ranked. This is operators/selection.py's boundary-bucket trick
with the declared-edges requirement dissolved by hash uniformity.

Reference tie-in: the reference app (damc-dev/example-cdk-dynamodb-
stream-to-redshift) has no sampling surface (sql/queries.sql caps with
ORDER BY .. LIMIT only); this extends the engine for training-data
curation per the build brief, composing with bottomk (store), selection
(budget semantics), and the split/sample md5 conventions used across
plans/inventory_pipeline.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bottomk import key_hash

_CTL_SCHEMA = T.StructType(
    [
        T.StructField("__mx_group__", T.StringType(), False),
        T.StructField("__mx_target__", T.LongType(), False),
    ]
)


def mixture_targets(
    counts: dict, alpha: float, budget: int
) -> dict[str, int]:
    """Exact integer per-group targets for a temperature-``alpha`` mix of
    ``budget`` keys over populations ``counts`` (group -> distinct-key
    count). Group names are coerced to strings (the sample-store
    convention). Pure driver-side arithmetic on a |groups|-sized dict —
    deterministic: waterfill caps (share >= population => take exactly
    the population, re-share the rest), then largest-remainder rounding
    with (fraction desc, group asc) ties.

    Invariants (property-pinned): 0 <= target_g <= n_g; sum(targets) ==
    min(budget, sum(counts)); alpha=0 splits evenly up to caps; alpha=1
    splits proportionally up to rounding.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    n: dict[str, int] = {}
    for g, c in counts.items():
        c = int(c)
        if c < 0:
            raise ValueError(f"count for group {g!r} is negative: {c}")
        key = str(g)
        if key in n:
            raise ValueError(f"duplicate group after str() coercion: {key!r}")
        n[key] = c
    final: dict[str, int] = {g: 0 for g in n}
    active = {g for g, c in n.items() if c > 0}
    b = min(int(budget), sum(n.values()))
    # waterfill: a group whose proportional share meets its population is
    # finalized at the population and the residual re-shared; every round
    # finalizes >= 1 group, so this runs at most |groups| rounds
    while b > 0 and active:
        w = sum(n[g] ** alpha for g in active)
        capped = {g for g in active if b * (n[g] ** alpha) / w >= n[g]}
        if not capped:
            break
        for g in capped:
            final[g] = n[g]
            b -= n[g]
        active -= capped
    if b > 0 and active:
        w = sum(n[g] ** alpha for g in active)
        raw = {g: b * (n[g] ** alpha) / w for g in active}
        base = {g: int(math.floor(raw[g])) for g in active}
        leftover = b - sum(base.values())
        # raw_g < n_g for every surviving group (no capped left), so the
        # +1 below never exceeds a population; leftover < |active| by the
        # floor identity, so the pass always lands every unit
        for g in sorted(active, key=lambda g: (-(raw[g] - base[g]), g)):
            if leftover <= 0:
                break
            if base[g] < n[g]:
                base[g] += 1
                leftover -= 1
        final.update(base)
    return final


def group_key_counts(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """``(group, n)`` distinct-key population per group — the counts
    frame ``mixture_sample`` consumes. NULL keys and NULL groups are
    excluded (they identify nothing; same contract as bottomk_keys).
    One scan, map-side partial dedup, bounded output."""
    return (
        df.filter(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("group"),
            F.col(key_col).cast("string").alias("key"),
        )
        .distinct()
        .groupBy("group")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _counts_dict(
    df: DataFrame | None,
    key_col: str,
    group_col: str,
    counts: DataFrame | dict | None,
) -> dict[str, int]:
    """Resolve the population counts to a driver-side dict (bounded by
    |groups| — the artifact-sized collect idiom). A precomputed frame
    must carry exact populations; an estimate silently mis-targets."""
    if isinstance(counts, dict):
        return {str(g): int(c) for g, c in counts.items()}
    if counts is None:
        if df is None:
            raise ValueError("either a corpus frame or counts is required")
        counts = group_key_counts(df, key_col, group_col)
    else:
        cols = counts.columns
        if len(cols) != 2:
            raise ValueError(
                f"counts frame must be (group, n), got columns {cols}"
            )
        counts = counts.select(
            F.col(cols[0]).cast("string").alias("group"),
            F.col(cols[1]).cast("long").alias("n"),
        )
    return {r["group"]: int(r["n"]) for r in counts.collect()}


def _dedup_keys(df: DataFrame, key_col: str, group_col: str) -> DataFrame:
    """(group, key, h): distinct keys per group with the sampling hash —
    bottomk_keys' stratified frame with the group under a fixed name."""
    return (
        df.filter(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias(group_col),
            F.col(key_col).cast("string").alias("key"),
        )
        .distinct()
        .withColumn("h", key_hash("key"))
    )


def _targets_frame(
    spark: SparkSession, targets: dict[str, int]
) -> DataFrame:
    rows = [(g, int(t)) for g, t in sorted(targets.items())]
    return spark.createDataFrame(rows, _CTL_SCHEMA)


def mixture_sample_exact(
    df: DataFrame,
    key_col: str,
    group_col: str,
    alpha: float,
    budget: int,
    counts: DataFrame | dict | None = None,
) -> DataFrame:
    """The semantic definition: per group, the ``target_g`` hash-smallest
    distinct keys, via one row_number window per group — a full per-group
    key sort, usable at test scale and as the equality reference. Output:
    ``(group_col, key, h)``, key/h as strings (store convention)."""
    tgt = mixture_targets(
        _counts_dict(df, key_col, group_col, counts), alpha, budget
    )
    dedup = _dedup_keys(df, key_col, group_col)
    ctl = _targets_frame(df.sparkSession, tgt)
    win = Window.partitionBy(group_col).orderBy("h", "key")
    rn = "__mx_rn__"
    return (
        dedup.join(
            F.broadcast(ctl), F.col(group_col) == F.col("__mx_group__")
        )
        .withColumn(rn, F.row_number().over(win))
        .filter(F.col(rn) <= F.col("__mx_target__"))
        .select(group_col, "key", "h")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    alpha: float,
    budget: int,
    counts: DataFrame | dict | None = None,
) -> DataFrame:
    """Scale-path temperature mix, bit-equal to ``mixture_sample_exact``
    (pinned): md5-uniform prefix buckets -> bounded (group, bucket)
    histogram -> per-group boundary bucket broadcast back -> pure filter
    for full buckets, ranking for ONLY the ~n_g/256 boundary-bucket rows.
    No group is ever fully sorted; the corpus feeds the histogram and
    the two branch filters (exchange reuse collapses the repeated
    distinct where the subtrees stay identical — one ReusedExchange
    observed; pass ``counts`` — e.g. a maintained exact count — to drop
    the separate population scan).

    Output: ``(group_col, key, h)`` distinct keys; fetch full rows with
    ``bottomk.sample_rows`` (broadcast semi-join, the two-phase shape)."""
    tgt = mixture_targets(
        _counts_dict(df, key_col, group_col, counts), alpha, budget
    )
    spark = df.sparkSession
    dedup = _dedup_keys(df, key_col, group_col)
    # first two hex chars of the hash: 256 uniform buckets, no declared
    # edges needed (hash uniformity is the histogram's balance guarantee)
    bucket = F.conv(F.substring("h", 1, 2), 16, 10).cast("int")
    hist = (
        dedup.withColumn("__mx_b__", bucket)
        .groupBy(group_col, "__mx_b__")
        .agg(F.count(F.lit(1)).alias("__mx_cnt__"))
    )
    ctl = _targets_frame(spark, tgt)
    hw = (
        Window.partitionBy(group_col)
        .orderBy("__mx_b__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        hist.join(
            F.broadcast(ctl), F.col(group_col) == F.col("__mx_group__")
        )
        .withColumn(
            "__mx_below__", F.coalesce(F.sum("__mx_cnt__").over(hw), F.lit(0))
        )
        .withColumn("__mx_cum__", F.col("__mx_below__") + F.col("__mx_cnt__"))
    )
    # boundary: the unique bucket where the cumulative count crosses the
    # target (counts are positive, so the crossing bucket is unique);
    # target == 0 -> boundary -1 (keep nothing); target >= n_g -> no
    # crossing, boundary 256 (every bucket kept outright, no ranking)
    crossing = (F.col("__mx_below__") < F.col("__mx_target__")) & (
        F.col("__mx_cum__") >= F.col("__mx_target__")
    )
    per_group = cum.groupBy(group_col).agg(
        F.max(F.when(crossing, F.col("__mx_b__"))).alias("__mx_bnd_raw__"),
        F.max(F.when(crossing, F.col("__mx_below__"))).alias("__mx_off_raw__"),
        F.max("__mx_target__").alias("__mx_target__"),
    )
    boundary = per_group.select(
        F.col(group_col).alias("__mx_group__"),
        F.when(F.col("__mx_target__") <= 0, F.lit(-1))
        .otherwise(F.coalesce(F.col("__mx_bnd_raw__"), F.lit(256)))
        .alias("__mx_bnd__"),
        F.coalesce(F.col("__mx_off_raw__"), F.lit(0))
        .cast("long")
        .alias("__mx_off__"),
        "__mx_target__",
    )
    joined = dedup.withColumn("__mx_b__", bucket).join(
        F.broadcast(boundary), F.col(group_col) == F.col("__mx_group__")
    )
    full = joined.filter(F.col("__mx_b__") < F.col("__mx_bnd__")).select(
        group_col, "key", "h"
    )
    win = (
        Window.partitionBy(group_col)
        .orderBy("h", "key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edge = (
        joined.filter(F.col("__mx_b__") == F.col("__mx_bnd__"))
        .withColumn("__mx_rk__", F.count(F.lit(1)).over(win) + F.col("__mx_off__"))
        .filter(F.col("__mx_rk__") <= F.col("__mx_target__"))
        .select(group_col, "key", "h")
    )
    return full.unionByName(edge)


def mixture_from_sample(
    sample: DataFrame,
    counts: DataFrame | dict,
    group_col: str,
    alpha: float,
    budget: int,
) -> DataFrame:
    """Answer the temperature mix FROM a maintained bottom-k sample
    (streaming/sample_maintenance.BottomKSample.sample() with
    ``strata_cols=(group_col,)``) — zero corpus scans: the target_g
    hash-smallest keys are a prefix of the store's bottom-k whenever
    ``k >= target_g``, so re-mixing a streamed-in corpus at any (alpha,
    budget) reads kilobytes. Bit-equal to ``mixture_sample`` over the
    landed corpus (pinned).

    ``counts`` must be the EXACT per-group distinct-key populations
    (e.g. a maintained count aggregate) — the store itself only bounds
    them below. Raises when some group's target exceeds the store's
    kept rows (k was sized under the mix): a silent truncation would
    skew the mix toward whatever k happened to be."""
    tgt = mixture_targets(
        _counts_dict(None, "", "", counts), alpha, budget
    )
    kept = {
        r["g"]: int(r["c"])
        for r in sample.groupBy(
            F.col(group_col).cast("string").alias("g")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    short = {
        g: (t, kept.get(g, 0))
        for g, t in tgt.items()
        if t > kept.get(g, 0)
    }
    if short:
        worst = max(short.values(), key=lambda tc: tc[0])[0]
        raise ValueError(
            "mixture_from_sample: sample store is too small for this mix — "
            + ", ".join(
                f"group {g!r} needs {t} but the store kept {c}"
                for g, (t, c) in sorted(short.items())
            )
            + f"; maintain BottomKSample with k >= {worst}"
        )
    ctl = _targets_frame(sample.sparkSession, tgt)
    win = Window.partitionBy(group_col).orderBy("h", "key")
    rn = "__mx_rn__"
    return (
        sample.select(
            F.col(group_col).cast("string").alias(group_col), "key", "h"
        )
        .join(F.broadcast(ctl), F.col(group_col) == F.col("__mx_group__"))
        .withColumn(rn, F.row_number().over(win))
        .filter(F.col(rn) <= F.col("__mx_target__"))
        .select(group_col, "key", "h")
    )
