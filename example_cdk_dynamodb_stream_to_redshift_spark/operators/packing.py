"""Boundary-respecting sequence packing: first-fit-decreasing bin
packing of documents into fixed-token-budget training sequences.

The counterpart of ``plans/inventory_pipeline.sequence_packing``
(concat-and-chunk, which SPLITS documents at chunk boundaries — the
pretraining shape): here every document stays WHOLE, the
SFT/instruction-tuning constraint where an example must never straddle
two sequences. The cost of that constraint is boundary waste, so the
packer's job is minimizing it: first-fit-decreasing guarantees
``<= 11/9 * OPT + 6/9`` bins (Johnson 1973 / Dósa 2007's tight
constant), against the trivial one-doc-per-sequence ceiling.

Scale shape, mirroring how real training pipelines shard: packing is
SHARD-LOCAL. Documents are assigned to ``n_shards`` by a hash of their
id — ONE bounded shuffle — and each shard packs independently inside
one Arrow batch (``applyInPandas``); pack ids are globally unique by
construction (``shard * 2^32 + local``). Global FFD would serialize
the corpus through one node for at most an ``11/9``-factor's worth of
boundary waste; per-shard FFD keeps the bound per shard and the
whole operator embarrassingly parallel — at 100 TB each shard packs
its own slice and nothing else moves. Determinism: the shard hash
depends only on ids and the in-shard order is (size desc, id), so the
assignment is independent of input partitioning (pinned in tests).

Oversized documents (size > budget) cannot satisfy the invariant; each
becomes its own single-doc pack flagged ``oversize = true`` so the
caller can route them to truncation/splitting instead of silently
losing them — the quality-gate posture (surface, never drop).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ffd_pack(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 32,
    max_shard_rows: int = 4_000_000,
) -> DataFrame:
    """(id, size, shard, pack_id, oversize): every input row assigned to
    exactly one pack; sum(size) per non-oversize pack <= budget.

    ``budget`` is the training sequence length in the same units as
    ``size_col`` (tokens). ``n_shards`` bounds both the shuffle width
    and the worst-case boundary waste (each shard wastes at most its
    own FFD slack); size it like training data shards, not like Spark
    partitions — the two are decoupled on purpose.

    ``max_shard_rows`` is the defensive ceiling on one shard's Arrow
    batch: each shard packs inside a single in-memory pandas frame, so
    an under-sharded 100x run would otherwise OOM an executor
    mid-``applyInPandas`` with no hint of why. The guard raises an
    actionable error carrying the resize arithmetic instead. The frame
    is three narrow columns, so the default (~4M rows, roughly a few
    hundred MB with pandas overhead) is conservative for ordinary
    executor memory; raise it deliberately if your executors are fat.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if max_shard_rows <= 0:
        raise ValueError(
            f"max_shard_rows must be positive, got {max_shard_rows}"
        )

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(size_col).cast("long").alias("size"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("shard"),
    )

    out_schema = (
        "id " + dict(df.dtypes)[id_col] + ", size long, shard int, "
        "pack_id long, oversize boolean"
    )

    def _pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        # input contract enforced where the data is (no extra validation
        # scan): a null/negative size is a caller bug, surfaced loudly
        if len(pdf) > max_shard_rows:
            # hash assignment is ~uniform, so this shard estimates the
            # corpus: total ~ len * n_shards, and the hint solves
            # total / n_shards' <= max_shard_rows for n_shards'
            est_total = len(pdf) * n_shards
            hint = -(-est_total // max_shard_rows)  # ceil
            raise ValueError(
                f"ffd_pack: shard holds {len(pdf)} rows > max_shard_rows="
                f"{max_shard_rows} (one shard = one in-memory Arrow "
                f"batch). Estimated corpus ~{est_total} rows: raise "
                f"n_shards from {n_shards} to >= {hint}, or raise "
                "max_shard_rows if your executors have the memory."
            )
        if pdf["size"].isnull().any() or (pdf["size"] < 0).any():
            raise ValueError("ffd_pack: sizes must be non-negative and non-null")
        # deterministic within the shard regardless of arrival order:
        # FFD = sort by (size desc, id) then leftmost bin that fits.
        pdf = pdf.sort_values(
            ["size", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        packs, oversize = _ffd_assign(
            [int(s) for s in pdf["size"]], budget
        )
        pdf["pack_id"] = [shard * (1 << 32) + p for p in packs]
        pdf["oversize"] = oversize
        return pdf

    return base.groupBy("shard").applyInPandas(_pack_shard, out_schema)


def _make_ffd_assign():
    """Factory so the assign function pickles BY VALUE (its qualname
    contains ``<locals>``, which cloudpickle cannot serialize as an
    importable reference): ``_pack_shard`` closes over it, and a
    module-level def here would ride the closure to the executors as a
    module REFERENCE — ModuleNotFoundError the moment the driver runs
    outside the repo root (the round-5 simhash64 bug class, re-caught
    by the round-9 foreign-CWD drive; the simhash factory is the
    repo's canonical fix, and tests/test_pickle_safety.py now flags
    the transitive shape statically)."""

    def _ffd_assign(
        sizes: list[int], budget: int
    ) -> tuple[list[int], list[bool]]:
        """Leftmost-fit bin assignment in O(n log n): a max-segment-tree
        over bin residual capacities answers 'leftmost bin with cap >=
        sz' by root-to-leaf descent (go left whenever the left
        subtree's max fits). The naive scan-every-open-bin loop is
        O(n^2) — a million-doc shard whose sizes hover above budget/2
        opens ~n bins and scans ~n/2 each placement (r9 review
        finding); the tree makes the same FIRST-fit choice, so
        assignments are bit-identical to the reference loop (equality
        pinned in tests). Bins are indexed in opening order; oversize
        docs take an index without opening a usable bin (leaf stays at
        the -1 sentinel, never accepts rows)."""
        n = len(sizes)
        width = 1
        while width < max(n, 1):
            width *= 2
        tree = [-1] * (2 * width)  # node -> max residual capacity below it

        def _set(leaf: int, cap: int) -> None:
            i = leaf + width
            tree[i] = cap
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2

        n_bins = 0
        packs: list[int] = []
        oversize: list[bool] = []
        for sz in sizes:
            if sz > budget:
                packs.append(n_bins)  # flagged singleton, leaf stays closed
                oversize.append(True)
                n_bins += 1
                continue
            if tree[1] >= sz:
                i = 1
                while i < width:
                    i = 2 * i if tree[2 * i] >= sz else 2 * i + 1
                b = i - width
                _set(b, tree[i] - sz)
            else:
                b = n_bins
                n_bins += 1
                _set(b, budget - sz)
            packs.append(b)
            oversize.append(False)
        return packs, oversize

    return _ffd_assign


_ffd_assign = _make_ffd_assign()


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row packing report from an ``ffd_pack`` result: pack counts,
    fill factor, boundary waste, and the oversize tail — ONE bounded
    aggregation over the assignment table (never re-reads the corpus)."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("size").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("over"),
        F.count("*").alias("n_docs"),
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum(F.when(F.col("over") == 1, 1).otherwise(0)).alias(
            "n_oversize_packs"
        ),
        F.sum(F.when(F.col("over") == 0, F.col("fill")).otherwise(0)).alias(
            "packed_tokens"
        ),
        F.sum(
            F.when(F.col("over") == 0, F.lit(budget) - F.col("fill")).otherwise(0)
        ).alias("wasted_tokens"),
        # 0.0 when every pack is oversize: the zero non-oversize count
        # would otherwise divide-by-zero (ANSI) or surface NULL to a
        # threshold comparison (r9 review finding)
        F.when(
            F.sum(F.when(F.col("over") == 0, 1).otherwise(0)) > 0,
            F.sum(F.when(F.col("over") == 0, F.col("fill")).otherwise(0))
            / (
                F.sum(F.when(F.col("over") == 0, 1).otherwise(0))
                * F.lit(float(budget))
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("fill_factor"),
    )
