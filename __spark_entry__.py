"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
the SURVEY.md §2 operator inventory; ``oracle_sql()`` gives the DuckDB
equivalent for each. Implementation lives in
``example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 'rewards by member' (J1+A3+O3, sql/queries.sql:22-32
    analogue) on /root/testdata/sf0.001."""
    return REGISTRY["rewards_by_member"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
