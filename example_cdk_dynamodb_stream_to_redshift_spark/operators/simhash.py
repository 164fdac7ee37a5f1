"""SimHash near-duplicate detection (64-bit signatures, Hamming search).

SimHash is the one dedup operator where a vectorized Pandas UDF beats a
built-in composition: the 64-dimension bit-vote accumulation per token is a
tight numeric loop — perfect for Arrow-batched numpy, painful as nested
``transform``s. (This is the sanctioned 'slow path' per the build rules:
built-ins first, Pandas UDF where semantics demand it.)

Signature: for each whitespace token, hash to 64 bits (md5-derived —
deterministic, seed-free); each bit votes +1/-1; sign of the vote sum is the
signature bit. Near-dups: Hamming(sig_a, sig_b) <= d, found with the
pigeonhole block trick — split 64 bits into d+1 blocks; any pair within
distance d must share at least one exact block, so candidates come from
d+1 cheap equi-joins instead of an all-pairs scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _make_simhash64():
    """64-bit SimHash pandas_udf (Arrow-batched), built as a FACTORY:
    the kernel is a nested closure so cloudpickle serializes it by
    VALUE — a module-level pandas_udf pickles as a reference this
    package's Python workers must re-import, and workers only share the
    driver's CWD, not its sys.path, so that dies with
    ModuleNotFoundError whenever the driver runs outside the repo root
    (same hardening as multimodal._make_fake_decode / knn_join).

    Per doc: token-count vector × (±1 bit-vote matrix of its DISTINCT
    tokens) — one integer matvec instead of a per-occurrence Python
    loop, with the per-token vote rows memoized across the batch (small
    vocabulary relative to token volume, so each distinct token's md5
    runs once). Empty/null text keeps the historical all-ones signature
    (every vote sum is 0, and 0 >= 0 sets the bit)."""

    def kernel(texts: pd.Series) -> pd.Series:
        import hashlib as _hl
        from collections import Counter

        bit_idx = np.arange(63, -1, -1, dtype=np.uint64)
        pow2 = (np.uint64(1) << bit_idx).astype(np.uint64)
        cache: dict = {}

        def votes(token: str) -> np.ndarray:
            row = cache.get(token)
            if row is None:
                h = np.uint64(
                    int.from_bytes(_hl.md5(token.encode("utf-8")).digest()[:8], "big")
                )
                bits = ((h >> bit_idx) & np.uint64(1)).astype(np.int32)
                row = 2 * bits - 1
                cache[token] = row
            return row

        out = np.empty(len(texts), dtype=np.int64)
        all_ones = np.int64(np.uint64(0xFFFFFFFFFFFFFFFF).astype(np.int64))
        for i, text in enumerate(texts):
            toks = str(text).split() if text else []
            if not toks:
                out[i] = all_ones
                continue
            cnt = Counter(toks)
            votes_matrix = np.stack([votes(t) for t in cnt])
            counts = np.fromiter(cnt.values(), dtype=np.int32, count=len(cnt))
            weights = counts @ votes_matrix
            out[i] = np.int64(
                np.bitwise_or.reduce(pow2[weights >= 0], initial=np.uint64(0))
            )
        return pd.Series(out)

    return F.pandas_udf(kernel, T.LongType())


simhash64 = _make_simhash64()


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    # Non-deterministic marking (guide §4.4, the bloom-probe idiom): the
    # kernel is pure, but left deterministic the pigeonhole join's
    # inferred isnotnull(blk) constraint pushes BELOW the signature
    # projection and the optimizer duplicates the ArrowEvalPython — each
    # join side then evaluates the kernel twice (filter copy + projection
    # copy), observed in the r14 executed plan. Marking it
    # non-deterministic keeps exactly one evaluation per side, which the
    # join's ReusedExchange then collapses to one per query.
    return df.select(
        F.col(id_col).alias("id"),
        simhash64.asNondeterministic()(F.col(text_col)).alias("sig"),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with Hamming(sig_a, sig_b) <= max_hamming via pigeonhole blocks.

    d+1 blocks of 64/(d+1) bits: a pair within distance d matches exactly on
    >= 1 block. Each block is a distributed equi-join on a 16-bit key with a
    strict ``id_a < id_b`` guard (no self-pairs even for duplicate ids);
    union + distinct, then exact Hamming verify with bit_count(XOR).

    The signature pipeline runs ONCE, fully lazily (r14): the block
    self-join is pinned SHUFFLE_HASH so both sides key on the SAME
    hashpartitioning(bi, blk) exchange over an identical
    scan->ArrowEvalPython->explode subtree — at runtime AQE executes one
    side and the other is a ReusedExchange, so the Pandas UDF evaluates
    each doc exactly once INSIDE the caller's own action. (The r6-r13
    form materialized signatures via localCheckpoint before the join;
    under AQE even the lazy variant runs its upstream stages at plan
    time — i.e. during spark_fn construction, OUTSIDE the timed action —
    the same finding that drove r13's honest-lazy rewrites. At corpus
    scale broadcasting a signature index was never viable; the shuffle
    join IS the 100 TB plan, hash not merge because the equi-probe
    needs no sort.)
    Enumerating pairs inside collected buckets instead would build
    |bucket|^2 structs in ONE row (duplicate-heavy corpora have a giant
    all-identical bucket — e.g. every empty doc shares one signature —
    and that row OOMs an executor); the join form distributes candidate
    pairs across the shuffle. The d+1 block keys are built in one
    projection and posexploded, so all blocks ride ONE equi-join on
    (block_idx, key) instead of d+1 separate joins."""
    sigs = simhash_signatures(df, text_col, id_col)
    n_blocks = max_hamming + 1
    width = 64 // n_blocks

    def block(col, i):
        return F.shiftrightunsigned(col, i * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )

    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("bi"), block(F.col("sig"), i).alias("blk")
            )
            for i in range(n_blocks)
        ]
    )
    exploded = sigs.select("id", "sig", F.explode(blocks).alias("b")).select(
        "id", "sig", F.col("b.bi").alias("bi"), F.col("b.blk").alias("blk")
    )
    a = exploded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "bi", "blk"
    ).hint("shuffle_hash")
    b = exploded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "bi", "blk"
    ).hint("shuffle_hash")
    cands = (
        a.join(b, ["bi", "blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .drop("bi", "blk")
    )

    return (
        cands.distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
