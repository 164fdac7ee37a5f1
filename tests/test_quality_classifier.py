"""Quality classifier (operators/quality_classifier.py): distributed
full-batch GD vs a plain-numpy reference on the same features, feature
determinism, and end-to-end discrimination on a separable corpus."""

from __future__ import annotations

import numpy as np
import pytest

POS_WORDS = ["clean", "prose", "article", "reference", "cited", "edited"]
NEG_WORDS = ["zzz", "spamspam", "clickbux", "w1nn3r", "freefree", "xoxo"]


def _corpus(n=120):
    rows = []
    for i in range(n):
        words = POS_WORDS if i % 2 == 0 else NEG_WORDS
        # deterministic pseudo-random-ish doc: rotate + repeat
        text = " ".join(words[(i + j) % len(words)] for j in range(12))
        rows.append((i, text, 1 if i % 2 == 0 else 0))
    return rows


@pytest.fixture(scope="module")
def trained(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.quality_classifier import (
        hashed_features,
        train_quality_model,
    )

    docs = spark.createDataFrame(
        _corpus(), "doc_id long, text string, label int"
    ).repartition(6)
    feats = hashed_features(docs, dim=64).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    feats = feats.localCheckpoint(eager=True)  # featurize once, 30 epochs
    w = train_quality_model(feats, "label", dim=64, epochs=30)
    return docs, feats, w


def test_separable_corpus_is_classified(spark, trained):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.quality_classifier import (
        score_quality,
    )

    docs, _, w = trained
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in score_quality(docs, w, dim=64).collect()
    }
    acc = sum(
        (scores[i] >= 0.5) == (i % 2 == 0) for i in range(len(scores))
    ) / len(scores)
    assert acc == 1.0  # fully separable vocabularies
    # scores are probabilities and confidently split
    pos = [scores[i] for i in range(0, 120, 2)]
    neg = [scores[i] for i in range(1, 120, 2)]
    assert min(pos) > 0.6 and max(neg) < 0.4


def test_matches_numpy_reference_gd(spark, trained):
    _, feats, w = trained
    rows = feats.select("features", "label").collect()
    x = np.asarray([r["features"] for r in rows], dtype=np.float64)
    y = np.asarray([r["label"] for r in rows], dtype=np.float64)
    ref = np.zeros(65)
    for epoch in range(30):
        z = x @ ref[:-1] + ref[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.zeros_like(ref)
        g[:-1] = x.T @ (p - y) / len(y)
        g[-1] = (p - y).sum() / len(y)
        g[:-1] += 1e-4 * ref[:-1]
        ref = ref - (2.0 / np.sqrt(epoch + 1.0)) * g
    # distributed partials sum in a different order than one numpy matmul:
    # identical up to float associativity over 30 epochs
    assert np.allclose(w, ref, atol=1e-8)


def test_features_deterministic_and_normalized(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.quality_classifier import (
        hashed_features,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["features"] for r in hashed_features(docs, dim=32).collect()}
    b = {r["doc_id"]: r["features"] for r in hashed_features(docs, dim=32).collect()}
    assert a == b  # crc32 bucketing: run-to-run identical
    assert np.isclose(np.linalg.norm(a[1]), 1.0)
    assert np.linalg.norm(a[2]) == 0.0 and np.linalg.norm(a[3]) == 0.0


def test_empty_input_returns_zero_weights(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.quality_classifier import (
        hashed_features,
        train_quality_model,
    )

    docs = spark.createDataFrame([], "doc_id long, text string, label int")
    feats = hashed_features(docs, dim=16).join(
        docs.select("doc_id", "label"), "doc_id"
    )
    w = train_quality_model(feats, "label", dim=16, epochs=3)
    assert not w.any()


def test_oracle_crc32_sql_matches_zlib_on_non_ascii():
    """The frozen-scoring oracle's SQL crc32 must hash UTF-8 BYTES, like
    the operator's zlib.crc32(tok.encode('utf-8')) — per-character code
    points agree only for ASCII and silently drop tokens with code points
    > 255 (ADVICE r7). Pinned byte-for-byte on multi-byte and astral
    text, independent of the documents fixture staying ASCII."""
    import zlib

    import duckdb

    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory_ml import (
        _crc32_sql,
    )

    toks = ["hello", "héllo", "日本語", "naïve", "emoji🙂mix", "ß", "a"]
    con = duckdb.connect()
    got = [
        con.execute(
            f"SELECT {_crc32_sql('t')} FROM (SELECT ?::VARCHAR AS t)", [t]
        ).fetchone()[0]
        for t in toks
    ]
    want = [zlib.crc32(t.encode("utf-8")) for t in toks]
    assert got == want
