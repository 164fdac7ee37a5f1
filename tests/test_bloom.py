"""operators/bloom.py: no false negatives ever, false-positive rate in
the ballpark theory predicts, and the bloom-prefiltered decontamination
query returns byte-identical results to the direct-join form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.bloom import (
    build_bloom,
    might_contain_filter,
)

from .conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def keyed(spark):
    # 2000 md5 keys; first 500 go into the filter
    return spark.range(2000).select(
        "id", F.md5(F.col("id").cast("string")).alias("g")
    )


def test_no_false_negatives(spark, keyed):
    members = keyed.filter("id < 500")
    bits = build_bloom(members, "g", num_bits=1 << 16, k=4)
    kept = might_contain_filter(keyed, "g", bits, 1 << 16, 4)
    member_ids = {r["id"] for r in members.collect()}
    kept_ids = {r["id"] for r in kept.collect()}
    assert member_ids <= kept_ids  # every true member survives


def test_false_positive_rate_sane(spark, keyed):
    members = keyed.filter("id < 500")
    # 2^16 bits for 500 keys * 4 lanes -> load ~0.03, fp ~ (0.03)^4 tiny;
    # allow a loose ceiling (binomial noise on 1500 non-members)
    bits = build_bloom(members, "g", num_bits=1 << 16, k=4)
    kept = might_contain_filter(keyed, "g", bits, 1 << 16, 4)
    n_fp = kept.filter("id >= 500").count()
    assert n_fp <= 5, f"implausible fp count {n_fp}"


def test_tiny_bitset_still_exact_after_verify_join(spark, keyed):
    # saturate a deliberately small bitset: many false positives, but a
    # verify join must still recover the exact membership
    members = keyed.filter("id < 500")
    bits = build_bloom(members, "g", num_bits=1 << 8, k=2)
    kept = might_contain_filter(keyed, "g", bits, 1 << 8, 2)
    assert kept.count() > 500  # the saturated filter over-keeps...
    exact = kept.join(members.select("g"), "g").select("id")
    assert {r["id"] for r in exact.collect()} == set(range(500))


def test_large_bitset_flat_driver_build(spark, keyed):
    # 2^26 bits = 8 MiB packed bitset. The build must stay executor-side:
    # the driver only ever OR-folds one partition bitset at a time, so this
    # runs in flat memory no matter how many keys feed it (the old design
    # collected k*|keys| position Rows). Correctness is unchanged: no false
    # negatives, and at this load factor essentially no false positives.
    members = keyed.filter("id < 500")
    bits = build_bloom(members, "g", num_bits=1 << 26, k=4)
    assert bits.nbytes == (1 << 26) // 8
    kept = might_contain_filter(keyed, "g", bits, 1 << 26, 4)
    kept_ids = {r["id"] for r in kept.collect()}
    assert set(range(500)) <= kept_ids
    assert len(kept_ids) <= 505


def test_rejects_bad_params(spark, keyed):
    with pytest.raises(ValueError, match="k must be"):
        build_bloom(keyed, "g", num_bits=1 << 16, k=5)
    with pytest.raises(ValueError, match="32-bit lane"):
        build_bloom(keyed, "g", num_bits=1 << 33, k=4)


def test_bloom_decontamination_matches_direct(spark):
    from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory_pipeline import (
        ngram_decontamination,
        ngram_decontamination_bloom,
    )

    direct = ngram_decontamination(spark, SF_CORRECTNESS).collect()
    bloom = ngram_decontamination_bloom(spark, SF_CORRECTNESS).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in bloom]


def test_prebuilt_broadcast_reuse(spark):
    """Callers probing repeatedly can broadcast the bitset ONCE and pass
    the handle (ADVICE r3: per-call broadcasts accumulate executor blocks
    until Python GC); results are identical and the caller owns cleanup."""
    members = spark.createDataFrame([(m,) for m in ("alpha", "beta")], "s string")
    members = members.select(F.md5("s").alias("g"))
    keyed = spark.createDataFrame(
        [(s,) for s in ("alpha", "beta", "gamma", "delta")], "s string"
    ).select("s", F.md5("s").alias("g"))
    bits = build_bloom(members, "g", num_bits=1 << 16, k=4)
    bc = spark.sparkContext.broadcast(bits)
    try:
        kept1 = {r["s"] for r in might_contain_filter(keyed, "g", bc, 1 << 16, 4).collect()}
        kept2 = {r["s"] for r in might_contain_filter(keyed, "g", bc, 1 << 16, 4).collect()}
    finally:
        bc.unpersist()
    assert {"alpha", "beta"} <= kept1 and kept1 == kept2
