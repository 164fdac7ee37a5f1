"""Round-10 staged oracle candidates (plans/staged_r10.py): DuckDB
equivalence pinned at sf0.001 BEFORE registration day, plus the
preconditions the typed-scrub oracle's construction relies on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators.redaction import (
    pii_stats,
)
from example_cdk_dynamodb_stream_to_redshift_spark.plans.staged_r10 import (
    STAGED_R10,
)
from example_cdk_dynamodb_stream_to_redshift_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(STAGED_R10))
def test_staged_query_matches_duckdb(spark, con, name):
    fn, sql = STAGED_R10[name]
    s = sorted(tuple(map(str, r)) for r in fn(spark, SF_DIR).collect())
    d = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    assert s == d
    assert len(s) > 0


def test_corpus_is_detector_free(spark):
    """The typed-scrub oracle restates the scrubbed text by STRING
    CONSTRUCTION, which is only valid while the raw corpus text
    triggers zero detectors (the driver corpus is synthetic prose). If
    this ever fails, the oracle must switch to a regex restatement —
    better to learn that here than as a red driver row."""
    docs = load_table(spark, SF_DIR, "documents")
    total = (
        pii_stats(docs, "text").agg(F.sum("pii_total").alias("t")).collect()
    )[0]["t"]
    assert total == 0
    # the oracle also assumes NO NULL text: a NULL-text doc would make
    # the Spark side emit NULL counts/md5 while the oracle emits the
    # seeded constants — pin the precondition here, not on registration
    # day (r9 review finding)
    assert docs.filter(F.col("text").isNull()).count() == 0


def test_staged_plan_shapes(spark):
    """Pre-pin the plan shapes registration day will fence via
    plan_budgets: the profile query is ONE scan + ONE aggregation (the
    one-scan contract) and the typed scrub is a pure projection — no
    join, no Python eval, the only exchanges from the final ORDER BY."""
    fn, _ = STAGED_R10["events_value_drift_profile"]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "Join"):
        assert marker not in plan, plan

    fn2, _ = STAGED_R10["typed_pii_scrub_docs"]
    plan2 = fn2(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Scan parquet") == 1, plan2
    for marker in ("BatchEvalPython", "ArrowEvalPython", "Join", "HashAggregate"):
        assert marker not in plan2, plan2


def test_profile_query_column_names_match_oracle(spark, con):
    """The driver sorts columns BY NAME before hashing — a Spark/oracle
    name mismatch hash-fails even on equal values."""
    fn, sql = STAGED_R10["events_value_drift_profile"]
    spark_cols = fn(spark, SF_DIR).columns
    duck_cols = [d[0] for d in con.execute(sql).description]
    assert spark_cols == duck_cols == ["column", "bucket", "cnt"]
    fn2, sql2 = STAGED_R10["typed_pii_scrub_docs"]
    spark_cols2 = fn2(spark, SF_DIR).columns
    duck_cols2 = [d[0] for d in con.execute(sql2).description]
    assert spark_cols2 == duck_cols2
