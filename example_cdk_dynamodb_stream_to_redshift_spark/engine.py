"""Engine facade: the reference's client-facing query API re-expressed.

The reference exposes queries through the redshift-data async HTTP API —
``execute-statement`` (optionally with named parameters ``:pk``) -> poll
``describe-statement`` -> ``get-statement-result``
(``scripts/test_sync_time.sh:14-34,81-92``,
``scripts/query_materialized_view.sh:9-12``). The async shape is an artifact
of that HTTP API, not a semantic requirement (SURVEY.md S8); the Spark
equivalent is a synchronous ``run_sql`` returning a DataFrame, with named
parameters bound server-side by ``spark.sql(..., args=...)`` (literal-safe —
parameters are injected as typed literals into the parsed plan, never
string-spliced, so predicate pushdown still sees a foldable literal).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

from .dialect import rewrite as rewrite_redshift
from .sources.tables import register_views


class Engine:
    """Session + catalog wrapper: registers the warehouse tables as views
    and runs (optionally parameterized) SQL against them."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        register_views(spark, sf_dir)

    def run_sql(
        self,
        sql: str,
        params: Mapping[str, Any] | None = None,
        dialect: str | None = None,
    ) -> DataFrame:
        """Mirror of execute-statement with named parameters (``:name``).

        ``dialect="redshift"`` first rewrites the text through the
        Redshift-dialect shim (dialect.py) so the reference's SQL artifacts
        — sql/queries.sql, stored-proc statement bodies — run verbatim.
        """
        if dialect == "redshift":
            sql = rewrite_redshift(sql)
        elif dialect is not None:
            raise ValueError(f"unknown dialect: {dialect!r}")
        if params:
            return self.spark.sql(sql, args=dict(params))
        return self.spark.sql(sql)
