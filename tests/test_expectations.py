"""Data-quality expectations (operators/expectations.py): each check
type's violation accounting on crafted rows, the one-scan plan
guarantee, the clean/flagged row split, and FK orphan counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import expectations as EX
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _df(spark):
    rows = [
        (1, "a", 10, "x@y.com"),
        (2, "b", -5, "nope"),
        (3, None, 50, None),
        (4, "a", 10_000, "z@w.org"),
        (1, "c", 20, "q@r.io"),  # duplicate id=1
    ]
    return spark.createDataFrame(rows, "id long, cat string, v long, email string")


def _checks():
    # built lazily: Column construction needs an active SparkContext
    return [
        EX.not_null("cat"),
        EX.in_range("v", 0, 100),
        EX.accepted_values("cat", ["a", "b"]),
        EX.matches("email", r"^[^@]+@[^@]+$"),
        EX.unique("id"),
        EX.satisfies("v_even", F.col("v") % 2 == 0),
    ]


def test_validate_counts_each_check(spark):
    rep = {r["check"]: r for r in EX.validate(_df(spark), _checks()).collect()}
    assert all(r["n_rows"] == 5 for r in rep.values())
    assert rep["not_null(cat)"]["violations"] == 1          # id=3
    assert rep["in_range(v,0,100)"]["violations"] == 2      # -5, 10000
    assert rep["accepted_values(cat)"]["violations"] == 1   # "c" (NULL tolerated)
    assert rep["matches(email)"]["violations"] == 1         # "nope" (NULL tolerated)
    assert rep["unique(id)"]["violations"] == 1             # second id=1 row
    assert rep["v_even"]["violations"] == 1                 # -5
    assert not any(r["passed"] for r in rep.values())


def test_validate_passes_on_conforming_data(spark):
    clean = _df(spark).filter(F.col("id") == 4)
    rep = EX.validate(clean, _checks()).collect()
    assert all(r["passed"] for r in rep if r["check"] != "in_range(v,0,100)")


def test_validate_is_one_scan(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rep = EX.validate(
        docs,
        [EX.not_null("text"), EX.unique("doc_id"),
         EX.satisfies("nonempty", F.length("text") > 0)],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, "a suite of checks must cost ONE scan"
    got = {r["check"]: r["passed"] for r in rep.collect()}
    assert all(got.values())


def test_split_violations_partitions_rows_with_reasons(spark):
    clean, flagged = EX.split_violations(_df(spark), _checks())
    # exactly one row conforms to every row-level check: (1, "a", 10, x@y.com)
    assert [(r["id"], r["cat"]) for r in clean.collect()] == [(1, "a")]
    reasons = {(r["id"], r["cat"]): set(r["failed_checks"]) for r in flagged.collect()}
    assert "in_range(v,0,100)" in reasons[(2, "b")]
    assert "matches(email)" in reasons[(2, "b")]
    assert reasons[(4, "a")] == {"in_range(v,0,100)"}
    assert reasons[(1, "c")] == {"accepted_values(cat)"}
    # uniqueness is table-level: the duplicate id=1 rows are NOT flagged for it
    assert all("unique" not in x for xs in reasons.values() for x in xs)
    # clean + flagged partition the input
    assert clean.count() + flagged.count() == 5


def test_referential_integrity_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    (row,) = EX.referential_integrity(child, parent, "fk", "pk").collect()
    assert row["violations"] == 1 and not row["passed"]  # fk=99; NULL exempt
    assert row["n_rows"] == 4


def test_empty_input_passes(spark):
    empty = _df(spark).filter(F.lit(False))
    rep = EX.validate(empty, _checks()).collect()
    assert all(r["passed"] and r["violations"] == 0 and r["n_rows"] == 0 for r in rep)
