"""Broadcast Bloom-filter membership prefilter — the 100 TB shape for
"filter a huge relation by membership in a small-ish key set" (n-gram
decontamination, blocklist scrubs, id lookups).

Why not just broadcast-semi-join? A broadcast hash relation stores the
FULL keys: 10M md5 keys ≈ 1 GB per executor. A Bloom bitset at ~10
bits/key is ~12 MB for the same set, at the price of a false-positive
rate ε — which is fine when (as here) an exact equi-join verifies the
survivors: the bitset only decides WHAT SHUFFLES, never the answer. The
big side's shuffle volume drops from 100% to ε + true-match rate, and
the bitset rides the task-broadcast path instead of a per-executor hash
relation build.

Design constraints honored:
- membership positions are computed JVM-side (whole-stage codegen) by
  slicing the md5 hex key itself — the key IS already a uniform 128-bit
  hash, so k<=4 independent 32-bit lanes come free from substring+conv;
  no second hash pass, no Python in the position math.
- the bitset probe is a Pandas UDF doing k numpy fancy-index lookups per
  Arrow batch — vectorized C, no per-row Python. (Open-source Spark has
  no public `might_contain` SQL expression; its internal bloom-join uses
  one, which is the hint this is the right plan shape.)
- build phase assembles PACKED BITSETS EXECUTOR-SIDE: each partition
  emits one num_bits/8-byte array via Arrow, and the driver OR-folds
  them one at a time from a local iterator — driver memory is a flat
  2 x bitset regardless of |keys| (never k*|keys| position rows).
- the probe bitset rides an explicit SparkContext.broadcast (torrent
  blocks, one copy per executor) rather than a per-task closure pickle.

Reference scope: beyond the reference app (no dedup surface there);
extends the training-data-pipeline family per the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (pandas_udf type hints resolve via globals)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_LANES = 4  # md5 hex = 32 chars = four 8-char (32-bit) lanes


def _positions(key: str | Column, num_bits: int, k: int) -> list[Column]:
    """k bit positions from an md5-hex column, each a 32-bit hex lane mod
    num_bits — JVM-side, codegen'd. Requires num_bits <= 2^32 and the key
    to be md5 hex (32 lowercase hex chars)."""
    if not 1 <= k <= _MAX_LANES:
        raise ValueError(f"k must be 1..{_MAX_LANES} (md5 has 4 lanes), got {k}")
    if num_bits > 1 << 32:
        raise ValueError("num_bits must fit a 32-bit lane")
    c = F.col(key) if isinstance(key, str) else key
    return [
        F.pmod(
            F.conv(F.substring(c, i * 8 + 1, 8), 16, 10).cast("long"),
            F.lit(num_bits),
        )
        for i in range(k)
    ]


def build_bloom(
    keys: DataFrame, key_col: str, num_bits: int = 1 << 23, k: int = 4
) -> np.ndarray:
    """Packed uint8 bitset (num_bits/8 bytes) with every key's k lanes
    set. Each partition builds its own packed bitset (Arrow-batched
    numpy), and the driver OR-folds the per-partition bitsets streamed
    one at a time — peak driver memory is two bitsets, independent of
    the number of keys."""
    n_bytes = num_bits // 8
    pos_df = keys.select(*_positions(key_col, num_bits, k))

    def _partition_bits(batches):
        part = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            for col in pdf.columns:
                p = pdf[col].to_numpy(dtype=np.int64)
                np.bitwise_or.at(
                    part, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8)
                )
        yield pd.DataFrame({"bits": [part.tobytes()]})

    bits = np.zeros(n_bytes, dtype=np.uint8)
    partials = pos_df.mapInPandas(_partition_bits, "bits binary")
    for row in partials.toLocalIterator():
        bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return bits


def might_contain_filter(
    df: DataFrame,
    key_col: str,
    bits,
    num_bits: int,
    k: int = 4,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the set the bitset encodes
    (no false negatives; ~ (set_bits/num_bits)^k false positives). The
    bitset ships via an explicit SparkContext.broadcast, so every task
    reads the executor-local torrent copy instead of unpickling it from
    its own closure.

    ``bits`` is either the packed ``np.ndarray`` bitset (a broadcast is
    created per call — fine for one-shot queries, but repeated calls on a
    long-lived session each pin a bitset-sized broadcast block until the
    Python object is GC'd) or a pre-built ``SparkContext.broadcast`` of
    that array: callers that probe repeatedly (benchmark loops, resident
    services) should broadcast once, pass the handle, and ``unpersist()``
    it when the LAST DataFrame derived from it has been consumed —
    Spark's broadcast blocks are only dropped explicitly or at GC."""
    from pyspark.broadcast import Broadcast

    bc = (
        bits
        if isinstance(bits, Broadcast)
        else df.sparkSession.sparkContext.broadcast(bits)
    )

    @F.pandas_udf("boolean")
    def _probe(*lanes: pd.Series) -> pd.Series:
        bb = bc.value
        ok = np.ones(len(lanes[0]), dtype=bool)
        for lane in lanes:
            p = lane.to_numpy(dtype=np.int64)
            ok &= (bb[p >> 3] >> (p & 7).astype(np.uint8) & 1).astype(bool)
        return pd.Series(ok)

    # Non-deterministic marking (guide §4.4 applied to constraint
    # propagation): the probe is pure, but leaving it deterministic lets
    # Catalyst INFER the probe predicate across an equi-join on the key
    # (InferFiltersFromConstraints) — the r13 executed plan showed a second
    # ArrowEvalPython probing the very side the bitset was BUILT from,
    # where every row passes by construction: a full extra Arrow
    # round-trip of that side's key stream for zero selectivity. Marking
    # the UDF non-deterministic stops the optimizer duplicating it;
    # the filter stays exactly where this function puts it, which is the
    # only evaluation the plan needs (false positives are re-checked by
    # the caller's exact join either way).
    lanes = _positions(key_col, num_bits, k)
    return df.filter(_probe.asNondeterministic()(*lanes))
