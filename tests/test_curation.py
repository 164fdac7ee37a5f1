"""operators/curation.py: content-stability of the split, exact
histogram-boundary trim semantics, and the broadcast-filter plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.curation import (
    assign_split,
    quality_trim,
)


def test_split_is_content_stable_and_covers(spark):
    docs = spark.range(1000).select(F.concat(F.lit("doc "), "id").alias("text"))
    a = assign_split(docs).collect()
    # same content in a different row order -> identical assignment
    b = assign_split(docs.orderBy(F.col("text").desc())).collect()
    assert {r["text"]: r["split"] for r in a} == {r["text"]: r["split"] for r in b}
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in a:
        counts[r["split"]] += 1
    assert sum(counts.values()) == 1000
    # hash buckets are uniform-ish; loose sanity bounds only
    assert 700 < counts["train"] < 900
    assert 40 < counts["val"] < 160
    assert 40 < counts["test"] < 160


def test_split_rejects_bad_fractions(spark):
    docs = spark.range(1).select(F.lit("x").alias("text"))
    with pytest.raises(ValueError, match="train_pct"):
        assign_split(docs, train_pct=95, val_pct=10)


def test_trim_exact_boundary_semantics(spark):
    # one group, scores 1..10 once each: n=10, target=ceil(9) -> 9 kept,
    # threshold score 2 (cum_ge at score 2 is 9)
    df = spark.createDataFrame(
        [("g", s) for s in range(1, 11)], "grp string, score int"
    )
    kept = sorted(r["score"] for r in quality_trim(df, "score", "grp").collect())
    assert kept == list(range(2, 11))


def test_trim_never_splits_a_tie(spark):
    # 10 rows all score 5: the only boundary keeps everything
    df = spark.createDataFrame([("g", 5)] * 10, "grp string, score int")
    assert quality_trim(df, "score", "grp").count() == 10


def test_trim_keeps_at_least_fraction_per_group(spark):
    import random

    rng = random.Random(3)
    rows = [(f"g{i % 4}", rng.randrange(0, 50)) for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, score int")
    kept = quality_trim(df, "score", "grp", keep_num=3, keep_den=4)
    per_in = {k: sum(1 for g, _ in rows if g == k) for k in {g for g, _ in rows}}
    per_kept = {
        r["grp"]: r["c"]
        for r in kept.groupBy("grp").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for g, n in per_in.items():
        assert per_kept[g] >= (n * 3 + 3) // 4
    # and the cut is at a histogram boundary: min kept score's full tie
    # class survived
    for g in per_in:
        t = min(r["score"] for r in kept.collect() if r["grp"] == g)
        n_tie_in = sum(1 for gg, s in rows if gg == g and s == t)
        n_tie_kept = sum(
            1 for r in kept.collect() if r["grp"] == g and r["score"] == t
        )
        assert n_tie_in == n_tie_kept


def test_trim_rejects_bad_fraction(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, score int")
    with pytest.raises(ValueError, match="fraction"):
        quality_trim(df, "score", "grp", keep_num=11, keep_den=10)


def test_trim_plan_broadcasts_thresholds(spark):
    df = spark.createDataFrame(
        [("g", s) for s in range(1, 11)], "grp string, score int"
    )
    plan = quality_trim(df, "score", "grp")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunk_windows_tile_documents(spark):
    # every document is tiled: chunk 0 starts at token 0, consecutive chunks
    # advance by the stride, the final chunk reaches the last token, and all
    # non-final chunks are full windows
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory_pipeline import (
        _CHUNK_STRIDE,
        _CHUNK_W,
        doc_chunk_windows,
    )
    from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import (
        load_table,
    )
    from .conftest import SF_CORRECTNESS

    chunks = doc_chunk_windows(spark, SF_CORRECTNESS)
    docs = load_table(spark, SF_CORRECTNESS, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.min("first_token").alias("first0"),
            F.max(F.col("first_token") + F.col("n_chunk_tokens")).alias("reach"),
            F.max("first_token").alias("last_start"),
            F.sum(
                F.when(F.col("n_chunk_tokens") != _CHUNK_W, 1).otherwise(0)
            ).alias("n_partial"),
        )
        .join(docs, "doc_id")
    )
    bad = agg.filter(
        (F.col("first0") != 0)
        | (F.col("reach") != F.col("n_tokens"))            # tiles to the end
        | (F.col("last_start") != (F.col("n_chunks") - 1) * _CHUNK_STRIDE)
        | (F.col("n_partial") > 1)                         # only the tail short
    )
    assert bad.count() == 0, bad.limit(5).collect()
