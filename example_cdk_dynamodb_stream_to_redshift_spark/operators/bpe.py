"""Iterative BPE merge training as driver-coordinated DataFrame jobs.

Byte-pair encoding (Sennrich et al. 2016 — public method) trains a merge
table by repeatedly taking the most frequent adjacent symbol pair and
fusing it. The reference engine has no tokenizer surface (its SQL is
inventory analytics, sql/queries.sql); this extends the engine's
training-data family next to the one-shot ``bpe_pair_candidates`` scan —
the full iterative loop, same execution shape as the other iterative
operators here (k-means in operators/similarity.py, connected components
in operators/components.py): per-iteration distributed jobs, only a
constant-size model (one merge rule) crossing the driver per step.

Scale shape: training state is the WORD VOCAB (word-shape, count), not
the corpus — the corpus is scanned exactly once to build it, and a 100 TB
corpus's distinct-word vocab is bounded (tens of millions of rows,
uniform md5-ish keys). Each iteration is (a) one bounded-key pair
aggregation with map-side partials + a driver top-1, and (b) one
Arrow-batched merge application over the vocab. Lineage is truncated
every iteration via operators/lineage.py truncate_lineage (reliable
checkpoint opt-in for executor-loss recovery), the components.py trick, so N
merges never stack N plan generations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from .lineage import truncate_lineage


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(symbols array<string>, cnt bigint): distinct corpus words split
    into character symbols, weighted by occurrence count — the entire BPE
    training state. One explode + one groupBy on the uniform word key."""
    return (
        docs.select(F.explode(TX.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(F.split("w", "").alias("symbols"), "cnt")
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, pc): adjacent-pair frequencies weighted by word count.
    slice/zip is pure codegen; the aggregation key space is bounded by the
    live symbol alphabet squared."""
    n = F.size("symbols")
    pairs = vocab.select(
        "cnt",
        F.explode(
            F.arrays_zip(
                F.slice("symbols", 1, n - 1).alias("left"),
                F.slice("symbols", 2, n - 1).alias("right"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("cnt").cast("bigint").alias("pc"))


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Fuse every non-overlapping (left, right) occurrence left-to-right —
    the standard greedy BPE application ('aaa' + (a,a) -> ['aa','a']).
    Greedy sequential fusion is inherently order-dependent within a word,
    so this is one of the few places a vectorized pandas UDF is the honest
    tool; batches are Arrow-transferred vocab rows, never corpus rows."""

    @F.pandas_udf("array<string>")
    def merge(col: pd.Series) -> pd.Series:
        out = []
        for arr in col:
            res = []
            i, n = 0, len(arr)
            while i < n:
                if i + 1 < n and arr[i] == left and arr[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(arr[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return vocab.select(merge("symbols").alias("symbols"), "cnt")


def encode_vocab(
    words: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """(w, enc array<string>): apply the trained merges in rank order to
    each DISTINCT word — encoding cost is O(|vocab|), never O(corpus).
    One Arrow-batched UDF; within a word each rule fuses greedily
    left-to-right, identical to training's application order."""
    rules = [(left, right) for _, left, right, _ in merges]

    @F.pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        out = []
        for w in col:
            syms = list(w)
            for left, right in rules:
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.append(syms)
        return pd.Series(out)

    return words.select("w", enc("w").alias("enc"))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_bpe_tokens): corpus encoded with the
    merge table. The corpus side never runs Python: words explode with
    their position, the once-encoded vocab (bounded) broadcasts in, and
    per-doc token lists reassemble in word order via a sort-grouped
    flatten — the standard encode-the-vocab-not-the-corpus plan."""
    tok = docs.select(
        F.col(id_col), F.posexplode(TX.tokens(text_col)).alias("pos", "w")
    )
    vocab = tok.select("w").distinct()
    enc = encode_vocab(vocab, merges)
    joined = tok.join(F.broadcast(enc), "w")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col("enc")))
                    ),
                    lambda s: s["enc"],
                )
            ).alias("tokens")
        )
        .select(
            F.col(id_col),
            "tokens",
            F.size("tokens").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    min_count: int = 2,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Train ``n_merges`` BPE rules; returns [(rank, left, right,
    pair_count)]. Deterministic tie-break: count desc, then (left, right)
    lexicographic — reproducible across partitionings because the top-1
    reduces exact integer counts."""
    # LAZY lineage truncation (r13): each iteration's checkpoint
    # materializes DURING the next iteration's pair-count action (whose
    # global aggregation computes every vocab partition, so the cache is
    # complete) instead of paying its own eager job — halving the loop's
    # job count — and the final iteration's vocab, which nothing reads,
    # never materializes at all. Results are unchanged: the checkpoint
    # caches the same rows either way (tests/test_lineage_modes.py).
    vocab = word_vocab(docs, text_col).transform(
        lambda df: truncate_lineage(df, eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("pc"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["pc"] < min_count:
            break
        left, right, pc = top[0]["left"], top[0]["right"], top[0]["pc"]
        merges.append((rank, left, right, int(pc)))
        vocab = _apply_merge(vocab, left, right).transform(
            lambda df: truncate_lineage(df, eager=False)
        )
    return merges
