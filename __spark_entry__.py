"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
exposes every declared operator query from SURVEY.md §2 (built in
omfietser_etl_spark/catalog/); ``oracle_sql()`` gives the DuckDB
equivalents for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from omfietser_etl_spark.catalog import all_specs
from omfietser_etl_spark.catalog.relational import j5_multiway_revenue


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multiway star-join revenue rollup on sf0.001."""
    return j5_multiway_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.build for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
