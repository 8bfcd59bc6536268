"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in python_sql_datawarehouse_project_spark/ (see SURVEY.md §2 for
the operator inventory each query covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (EDA #1: monthly sales by product) on sf0.001."""
    from python_sql_datawarehouse_project_spark.operators.analytics import q1_monthly_sales_product

    return q1_monthly_sales_product(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from python_sql_datawarehouse_project_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same aliases)."""
    from python_sql_datawarehouse_project_spark import registry

    return registry.oracles()
