"""Mergeable HLL sketch tables (operators/sketches.py): shard-sketch +
merge must agree with exact distinct counts at small cardinality, obey
the sketch algebra (merge of shard sketches == sketch of the union),
survive a parquet round-trip of the binary column, and stay within the
HLL error envelope at larger cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.sketches import (
    merged_estimate,
    shard_sketches,
)


def _events(spark):
    # 4000 rows, 4 shards, per-shard distinct user sets that overlap:
    # shard s holds users [200*s, 200*s + 500) -> global distinct 1100
    return spark.range(4000).select(
        (F.col("id") % 4).alias("shard"),
        ((F.col("id") % 4) * 200 + F.expr("(id div 4) % 500")).alias("user_id"),
    )


def test_per_shard_estimates_inside_error_envelope(spark):
    df = _events(spark)
    sk = shard_sketches(df, ["shard"], "user_id")
    got = {
        r["shard"]: r["distinct_est"]
        for r in merged_estimate(sk, ["shard"]).collect()
    }
    # HLL standard error at lgk=12 is ~1.6%; each shard holds exactly
    # 500 distinct users
    assert set(got) == {0, 1, 2, 3}
    for shard, est in got.items():
        assert abs(est - 500) / 500 < 0.03, (shard, est)


def test_merged_estimate_counts_overlap_once(spark):
    df = _events(spark)
    sk = shard_sketches(df, ["shard"], "user_id")
    est = merged_estimate(sk).first()["distinct_est"]
    exact = df.select("user_id").distinct().count()
    assert exact == 1100  # fixture sanity: shards overlap by construction
    # 1100 coupons exceeds the sketch's exact (sparse) regime at lgk=12,
    # so this is an estimate — but a SUM over shards would say 2000, so
    # landing inside the error envelope proves overlap is counted once
    assert abs(est - exact) / exact < 0.03


def test_merge_of_shards_tracks_direct_sketch_and_is_deterministic(spark):
    # merging per-shard sketches is NOT guaranteed bitwise-equal to
    # sketching the union directly (the union gadget re-encodes), but it
    # must land in the same error envelope; and the algebra itself is
    # deterministic — the same merge repeated gives the identical value,
    # which is what makes persisted sketch tables reproducible artifacts
    df = _events(spark)
    sk = shard_sketches(df, ["shard"], "user_id")
    via_shards = merged_estimate(sk).first()["distinct_est"]
    again = merged_estimate(sk).first()["distinct_est"]
    direct = merged_estimate(
        shard_sketches(df.withColumn("one", F.lit(1)), ["one"], "user_id")
    ).first()["distinct_est"]
    assert via_shards == again
    assert abs(via_shards - direct) / direct < 0.03


def test_sketch_column_survives_parquet_round_trip(spark, tmp_path):
    df = _events(spark)
    sk = shard_sketches(df, ["shard"], "user_id")
    path = str(tmp_path / "sketches")
    sk.write.mode("overwrite").parquet(path)
    reread = spark.read.parquet(path)
    assert (
        merged_estimate(reread).first()["distinct_est"]
        == merged_estimate(sk).first()["distinct_est"]
    )


def test_error_envelope_at_large_cardinality(spark):
    # 200k distinct >> 2^12 registers: estimate within the standard
    # HLL relative-error envelope (~1.04/sqrt(2^12) ~ 1.6%; allow 5%)
    df = spark.range(200_000).select(
        (F.col("id") % 8).alias("shard"), F.col("id").alias("user_id")
    )
    est = merged_estimate(shard_sketches(df, ["shard"], "user_id")).first()[
        "distinct_est"
    ]
    assert abs(est - 200_000) / 200_000 < 0.05


def test_regroup_rollup_reads_only_sketches(spark):
    # day -> source roll-up: sketch per (source, day), merge per source;
    # 400 distinct users per source, estimates within the error envelope
    df = spark.range(3000).select(
        (F.col("id") % 3).alias("source"),
        (F.col("id") % 5).alias("day"),
        (F.col("id") % 400).alias("user_id"),
    )
    sk = shard_sketches(df, ["source", "day"], "user_id")
    per_source = {
        r["source"]: r["distinct_est"]
        for r in merged_estimate(sk, ["source"]).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in df.groupBy("source")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(per_source) == set(exact)
    for src, est in per_source.items():
        assert abs(est - exact[src]) / exact[src] < 0.03, (src, est)


def test_hierarchical_rollup_tracks_flat_merge(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators.sketches import (
        rollup_sketches,
    )

    # (source, day) sketches -> rolled up to source level AS SKETCHES ->
    # merged globally; must track the flat one-step global merge
    df = spark.range(6000).select(
        (F.col("id") % 3).alias("source"),
        (F.col("id") % 7).alias("day"),
        (F.col("id") % 900).alias("user_id"),
    )
    fine = shard_sketches(df, ["source", "day"], "user_id")
    coarse = rollup_sketches(fine, ["source"])
    via_hierarchy = merged_estimate(coarse).first()["distinct_est"]
    flat = merged_estimate(fine).first()["distinct_est"]
    exact = df.select("user_id").distinct().count()
    assert abs(via_hierarchy - exact) / exact < 0.03
    assert abs(via_hierarchy - flat) / max(flat, 1) < 0.03
    # and the coarse table is itself a persistable sketch table: its
    # per-source estimates stay in the envelope too (each source sees the
    # 300 residues congruent to it mod 3: gcd(3, 900) = 3)
    per_src = {
        r["source"]: r["distinct_est"]
        for r in merged_estimate(coarse, ["source"]).collect()
    }
    for src, est in per_src.items():
        assert abs(est - 300) / 300 < 0.03, (src, est)


# ---------------------------------------------------------------------------
# KMV sketches: the deterministic, cross-engine-reproducible counterpart
# ---------------------------------------------------------------------------

from example_cdk_dynamodb_stream_to_redshift_spark.operators.sketches import (  # noqa: E402
    kmv_estimate,
    kmv_merge,
    kmv_sketches,
)


def test_kmv_sketch_is_partitioning_invariant(spark):
    df = _events(spark)
    one = {
        r["shard"]: r["sketch"]
        for r in kmv_sketches(df.repartition(1), ["shard"], "user_id", k=64).collect()
    }
    many = {
        r["shard"]: r["sketch"]
        for r in kmv_sketches(df.repartition(7), ["shard"], "user_id", k=64).collect()
    }
    assert one == many and set(one) == {0, 1, 2, 3}
    for sk in one.values():
        assert len(sk) == 64 and sk == sorted(sk)


def test_kmv_matches_duckdb_derivation(spark):
    """The sketch is a pure function of the value set that an independent
    engine can restate: DuckDB's min-k over md5(CAST(v AS VARCHAR)) equals
    ours hash-for-hash — the property a driver oracle would check."""
    import duckdb

    df = _events(spark)
    got = {
        r["shard"]: r["sketch"]
        for r in kmv_sketches(df, ["shard"], "user_id", k=32).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev(shard BIGINT, user_id BIGINT)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?, ?)",
        [(r["shard"], r["user_id"]) for r in df.collect()],
    )
    want = dict(
        con.execute(
            """
            SELECT shard, list(g ORDER BY g)[:32] FROM (
              SELECT DISTINCT shard, md5(CAST(user_id AS VARCHAR)) AS g
              FROM ev) GROUP BY shard
            """
        ).fetchall()
    )
    assert got == want


def test_kmv_rollup_equals_direct_sketch_exactly(spark):
    """min-k of the union of per-shard min-k sets == min-k of the union of
    the underlying sets: rolling up loses NOTHING (exact array equality,
    stronger than the HLL envelope guarantee)."""
    df = _events(spark).withColumn("side", F.col("shard") % 2)
    per_shard = kmv_sketches(df, ["side", "shard"], "user_id", k=64)
    rolled = {
        r["side"]: r["sketch"]
        for r in kmv_merge(per_shard, ["side"], k=64).collect()
    }
    direct = {
        r["side"]: r["sketch"]
        for r in kmv_sketches(df, ["side"], "user_id", k=64).collect()
    }
    assert rolled == direct


def test_kmv_underfull_sketch_is_exact(spark):
    df = _events(spark).filter(F.col("user_id") < 10)  # few distincts
    sk = kmv_sketches(df, ["shard"], "user_id", k=64)
    for r in kmv_estimate(sk, k=64, group_cols=["shard"]).collect():
        exact = df.filter(F.col("shard") == r["shard"]).select(
            "user_id"
        ).distinct().count()
        assert r["distinct_est"] == exact


def test_kmv_estimate_inside_error_envelope(spark):
    # 5000 distinct values, k=256: KMV relative std error ~ 1/sqrt(k-2)
    # ~ 6.3%; assert a 4-sigma bound
    df = spark.range(10000).select(
        F.lit(0).alias("shard"), (F.col("id") % 5000).alias("v")
    )
    sk = kmv_sketches(df, ["shard"], "v", k=256)
    (est,) = kmv_estimate(sk, k=256, group_cols=["shard"]).collect()
    assert abs(est["distinct_est"] - 5000) / 5000 < 0.25, est


def test_kmv_sketch_survives_parquet_round_trip(spark, tmp_path):
    df = _events(spark)
    sk = kmv_sketches(df, ["shard"], "user_id", k=64)
    path = str(tmp_path / "kmv")
    sk.write.parquet(path)
    back = spark.read.parquet(path)
    a = {r["shard"]: r["sketch"] for r in sk.collect()}
    b = {r["shard"]: r["sketch"] for r in back.collect()}
    assert a == b
    # merging the re-read sketches still works and stays exact
    merged = {
        r["shard"] % 2: r["sketch"] for r in back.filter(F.col("shard") < 2).collect()
    }
    assert len(merged) == 2


def test_kmv_ignores_nulls_like_count_distinct(spark):
    df = spark.range(100).select(
        (F.col("id") % 2).alias("shard"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id") % 30).alias("v"),
    )
    got = {
        r["shard"]: r["sketch"]
        for r in kmv_sketches(df, ["shard"], "v", k=16).collect()
    }
    nn = df.filter(F.col("v").isNotNull())
    want = {
        r["shard"]: r["sketch"]
        for r in kmv_sketches(nn, ["shard"], "v", k=16).collect()
    }
    assert got == want
    # an all-NULL shard emits no sketch row (count-distinct = 0)
    allnull = df.withColumn("v", F.lit(None).cast("long"))
    assert kmv_sketches(allnull, ["shard"], "v", k=16).count() == 0


def test_kmv_merge_property_random_batch_splits(spark):
    """hypothesis: for random value multisets and random 2-way splits,
    merging the parts' sketches equals sketching the whole — the
    algebra the maintained store relies on."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=60),
        cut=st.integers(min_value=0, max_value=60),
        k=st.sampled_from([4, 16]),
    )
    def inner(vals, cut, k):
        cut = min(cut, len(vals))
        full = spark.createDataFrame([(0, v) for v in vals], "shard long, v long")
        a = spark.createDataFrame([(0, v) for v in vals[:cut]] or [(0, None)], "shard long, v long")
        b = spark.createDataFrame([(0, v) for v in vals[cut:]] or [(0, None)], "shard long, v long")
        parts = kmv_sketches(a, ["shard"], "v", k=k).unionByName(
            kmv_sketches(b, ["shard"], "v", k=k)
        )
        merged = {r["shard"]: r["sketch"] for r in kmv_merge(parts, ["shard"], k=k).collect()}
        direct = {r["shard"]: r["sketch"] for r in kmv_sketches(full, ["shard"], "v", k=k).collect()}
        assert merged == direct

    inner()
