"""Iterative BPE training (operators/bpe.py) vs a pure-Python reference
implementation, plus greedy-fusion edge cases."""

from __future__ import annotations

from collections import Counter

from example_cdk_dynamodb_stream_to_redshift_spark.operators import bpe as BPE


def _ref_bpe(words: list[str], n_merges: int, min_count: int = 2):
    """Straight-line reference BPE over word counts (Sennrich alg. 1)."""
    vocab = Counter(words)
    state = {w: tuple(w) for w in vocab}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += vocab[w]
        if not pc:
            break
        # count desc, then (left, right) lexicographic asc
        (left, right), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((rank, left, right, cnt))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = tuple(out)
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_reference_bpe(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new new newer",
        "widest wide wider wide",
    ]
    words = " ".join(texts).split(" ")
    got = BPE.train_bpe_merges(_docs(spark, texts), n_merges=8)
    assert got == _ref_bpe(words, 8)


def test_greedy_overlap_left_to_right(spark):
    # 'aaaa' x3: first merge is (a,a) and greedy fusion gives [aa, aa],
    # so the second merge must be (aa, aa) — overlap handled like the
    # reference, not pairwise-all-occurrences
    got = BPE.train_bpe_merges(_docs(spark, ["aaaa aaaa aaaa"]), n_merges=2)
    assert [(r, l, rt) for r, l, rt, _ in got] == [(0, "a", "a"), (1, "aa", "aa")]


def test_min_count_stops_training(spark):
    # every word unique, every pair count 1 < min_count=2 -> no merges
    got = BPE.train_bpe_merges(_docs(spark, ["ab cd ef"]), n_merges=4)
    assert got == []


def test_word_vocab_char_split(spark):
    rows = {
        tuple(r["symbols"]): r["cnt"]
        for r in BPE.word_vocab(_docs(spark, ["ab ab c"])).collect()
    }
    assert rows == {("a", "b"): 2, ("c",): 1}


def _ref_encode(word: str, merges) -> list[str]:
    syms = list(word)
    for _, left, right, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_encode_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new new newer",
    ]
    docs = _docs(spark, texts)
    merges = BPE.train_bpe_merges(docs, n_merges=6)
    got = {
        r["doc_id"]: r["tokens"] for r in BPE.bpe_encode(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        want = [s for w in t.split(" ") for s in _ref_encode(w, merges)]
        assert got[i] == want, (i, got[i], want)


def test_encode_preserves_word_order(spark):
    docs = _docs(spark, ["ab ba ab"])
    got = BPE.bpe_encode(docs, [(0, "a", "b", 2)]).collect()[0]
    assert got["tokens"] == ["ab", "b", "a", "ab"]
    assert got["n_bpe_tokens"] == 4


def test_registered_query_runs(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY

    rows = (
        REGISTRY["bpe_train_merges"]
        .spark_fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert 0 < len(rows) <= 6
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]
        assert r["pair_count"] >= 2


def test_registered_encode_query_runs(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY

    rows = (
        REGISTRY["bpe_encode_docs"]
        .spark_fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 500
    # every word contributes >= 1 symbol, and merging never grows the stream
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"] >= 1
