"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `local_datalakehouse_phase2_spark.registry`, which holds
one named entry per implemented operator from SURVEY.md §2 (plus the
Phase-4/5 extension operators). See the registry module for the
conventions that keep Spark↔DuckDB comparisons stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from local_datalakehouse_phase2_spark import registry
from local_datalakehouse_phase2_spark.operators.aggregates import q1_pricing_summary

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return q1_pricing_summary(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
