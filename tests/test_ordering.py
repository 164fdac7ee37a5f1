"""Deterministic epoch shuffling (operators/ordering.py): the
permutation is a seed-keyed bijection reproducible across runs and
engines (DuckDB md5 parity), seeds genuinely re-permute, shards are
uniform, epoch_order is shuffle-free, and the written layout is one
in-order directory per shard."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.ordering import (
    epoch_order,
    epoch_order_write,
    repeated_epoch_order,
)

N_DOCS = 500
N_SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N_DOCS).select(F.col("id").alias("doc_id"))


def _order(spark, docs, seed):
    rows = epoch_order(docs, "doc_id", seed, N_SHARDS).collect()
    return {r["doc_id"]: (r["shard"], r["h"]) for r in rows}


def test_same_seed_reproduces_bit_identically(spark, docs):
    assert _order(spark, docs, 7) == _order(spark, docs, 7)


def test_new_seed_is_a_new_permutation(spark, docs):
    a, b = _order(spark, docs, 1), _order(spark, docs, 2)
    assert set(a) == set(b)  # same docs
    # the h-orders genuinely differ (a fixed order would make every
    # epoch identical)
    rank_a = sorted(a, key=lambda d: a[d][1])
    rank_b = sorted(b, key=lambda d: b[d][1])
    assert rank_a != rank_b
    moved = sum(1 for d in a if a[d][0] != b[d][0])
    assert moved > N_DOCS // 4  # most docs change shard too


def test_keys_are_a_bijection_and_shards_uniform(spark, docs):
    got = _order(spark, docs, 3)
    assert len({h for _, h in got.values()}) == N_DOCS  # distinct keys
    counts = [0] * N_SHARDS
    for s, _ in got.values():
        counts[s] += 1
    mean = N_DOCS / N_SHARDS
    assert all(0.5 * mean <= c <= 1.5 * mean for c in counts), counts


def test_duckdb_reproduces_the_permutation(spark, docs):
    """The key is engine-portable: DuckDB's md5 over the same string
    yields the identical permutation (the md5-parity footing every
    hash-ordered oracle in the registry rests on)."""
    got = sorted(
        (r["h"], r["doc_id"])
        for r in epoch_order(docs, "doc_id", 11, N_SHARDS).collect()
    )
    want = duckdb.connect().execute(
        f"""
        SELECT md5('11:' || CAST(i AS VARCHAR)) AS h, i
        FROM range({N_DOCS}) t(i) ORDER BY 1
        """
    ).fetchall()
    assert got == [(h, i) for h, i in want]


def test_epoch_order_is_shuffle_free(spark, docs):
    plan = epoch_order(docs, "doc_id", 5, N_SHARDS)._jdf.queryExecution(
    ).explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan  # pure projection
    assert "Sort" not in plan


def test_existing_output_columns_rejected(spark):
    """A pre-sharded input must not have its columns silently clobbered."""
    df = spark.createDataFrame([(1, 0)], "doc_id long, shard int")
    with pytest.raises(ValueError, match="shard"):
        epoch_order(df, "doc_id", 1, 4)
    df2 = spark.createDataFrame([(1, "x", 2)], "doc_id long, h string, rep int")
    with pytest.raises(ValueError, match="'h'"):
        repeated_epoch_order(df2, "doc_id", "rep", 1, 4)


def test_repeat_working_column_collision_case_insensitive(spark):
    """Spark resolves names case-insensitively, so an input `_REP_K`
    must push the internal repeat counter to a fresh name instead of
    colliding with the generated `_rep_k`."""
    df = spark.createDataFrame(
        [(1, 2, "keepme")], "doc_id long, rep int, _REP_K string"
    )
    out = repeated_epoch_order(df, "doc_id", "rep", seed=1, n_shards=2)
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["_REP_K"] == "keepme" for r in rows)


def test_null_ids_rejected(spark):
    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    out = epoch_order(df, "doc_id", 1, 4)
    assert [r["doc_id"] for r in out.collect()] == [1]
    with pytest.raises(ValueError):
        epoch_order(df, "doc_id", 1, 0)


def test_repeated_order_scatters_each_copy(spark):
    df = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 0), (4, None)], "doc_id long, rep int"
    )
    out = repeated_epoch_order(df, "doc_id", "rep", seed=5, n_shards=4)
    rows = out.collect()
    # 3 copies of doc 1, 1 of doc 2; zero/NULL repeats drop out
    from collections import Counter

    assert Counter(r["doc_id"] for r in rows) == {1: 3, 2: 1}
    assert len({r["h"] for r in rows}) == 4  # every copy has its own key
    # reproducible bit-identically
    again = repeated_epoch_order(df, "doc_id", "rep", seed=5, n_shards=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_repeated_order_duckdb_parity(spark):
    df = spark.createDataFrame([(7, 2), (8, 3)], "doc_id long, rep int")
    got = sorted(
        (r["h"], r["doc_id"])
        for r in repeated_epoch_order(df, "doc_id", "rep", 9, 4).collect()
    )
    want = duckdb.connect().execute(
        """
        SELECT md5('9:' || CAST(doc_id AS VARCHAR) || '#' || CAST(k AS VARCHAR)) AS h,
               doc_id
        FROM (VALUES (7, 2), (8, 3)) t(doc_id, rep),
             LATERAL (SELECT unnest(generate_series(1, rep)) AS k)
        ORDER BY 1
        """
    ).fetchall()
    assert got == [(h, i) for h, i in want]


def test_repeated_order_rejects_float_repeats(spark):
    df = spark.createDataFrame([(1, 1.5)], "doc_id long, rep double")
    with pytest.raises(ValueError, match="integral"):
        repeated_epoch_order(df, "doc_id", "rep", 0, 4)


def test_repeated_order_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, rep int")
    plan = repeated_epoch_order(df, "doc_id", "rep", 0, 4)._jdf.queryExecution(
    ).explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan


def test_written_layout_is_sharded_and_in_order(spark, docs, tmp_path):
    path = str(tmp_path / "epoch0")
    epoch_order_write(docs, path, "doc_id", seed=0, n_shards=N_SHARDS)
    back = spark.read.parquet(path)
    assert back.count() == N_DOCS
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == set(
        range(N_SHARDS)
    )
    # every shard directory reads back already in training order
    for k in (0, 3, N_SHARDS - 1):
        hs = [
            r["h"]
            for r in spark.read.parquet(f"{path}/shard={k}").select("h").collect()
        ]
        assert hs == sorted(hs) and hs
    # the union is exactly the corpus, each doc exactly once
    ids = [r["doc_id"] for r in back.select("doc_id").collect()]
    assert sorted(ids) == list(range(N_DOCS))
