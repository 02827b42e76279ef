"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`hbase_increment_index_spark.queries` — the
registry of (DataFrame builder, DuckDB oracle SQL) pairs covering
SURVEY.md §2's operator inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hbase_increment_index_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (filter + facet + stats over events) at sf0.001."""
    return QUERIES["flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
