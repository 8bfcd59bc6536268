"""SQL-surface parity: the reference's analyst entry point is raw SQL
over the gold star (SURVEY.md §3.3 — EDA scripts + MV probes).  A
reference user must be able to paste equivalent SQL at THIS engine and
get the DataFrame gates' answers: star tables register as temp views
and spark.sql(...) must reproduce the oracled DataFrame results
row-for-row (same decimal money policy, Spark SQL dialect)."""

from __future__ import annotations

import pytest

from python_sql_datawarehouse_project_spark.star import star


@pytest.fixture(scope="module")
def star_views(spark, sf_dir):
    frames = star(spark, sf_dir)
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
    return sorted(frames)


def _rows(df):
    return sorted(map(str, df.collect()))


def test_views_registered(star_views):
    assert star_views == ["dim_customers", "dim_products", "fact_sales"]


def test_sql_monthly_sales_matches_q1_gate(spark, sf_dir, star_views):
    from python_sql_datawarehouse_project_spark.operators.analytics import (
        q1_monthly_sales_product,
    )

    got = spark.sql(
        """
        SELECT TRUNC(fs.order_date, 'month') AS month,
               dp.product_name, dp.category, dp.sub_category,
               CAST(SUM(fs.sales) AS DOUBLE) AS total_sales
        FROM fact_sales fs
        JOIN dim_products dp ON fs.product_key = dp.product_key
        GROUP BY 1, 2, 3, 4
        """
    )
    assert _rows(got) == _rows(q1_monthly_sales_product(spark, sf_dir))


def test_sql_window_topk_matches_q5_gate(spark, sf_dir, star_views):
    from python_sql_datawarehouse_project_spark.operators.analytics import (
        q5_top3_products_month_country,
    )

    got = spark.sql(
        """
        WITH g AS (
            SELECT TRUNC(fs.order_date, 'month') AS month,
                   dc.country, dp.product_name,
                   SUM(fs.sales) AS total_sales_dec
            FROM fact_sales fs
            JOIN dim_products dp ON fs.product_key = dp.product_key
            JOIN dim_customers dc ON fs.customer_key = dc.customer_key
            GROUP BY 1, 2, 3
        )
        SELECT month, country, product_name,
               CAST(total_sales_dec AS DOUBLE) AS total_sales, rank_sales
        FROM (
            SELECT *, RANK() OVER (
                PARTITION BY month, country
                ORDER BY total_sales_dec DESC) AS rank_sales
            FROM g
        ) WHERE rank_sales <= 3
        """
    )
    assert _rows(got) == _rows(q5_top3_products_month_country(spark, sf_dir))


def test_sql_rollup_matches_q8_gate(spark, sf_dir, star_views):
    from python_sql_datawarehouse_project_spark.operators.analytics import (
        q8_sales_rollup_product,
    )

    got = spark.sql(
        """
        SELECT dp.product_line, dp.category, dp.sub_category,
               CAST(SUM(fs.sales) AS DOUBLE) AS total_sales
        FROM fact_sales fs
        JOIN dim_products dp ON fs.product_key = dp.product_key
        GROUP BY ROLLUP (dp.product_line, dp.category, dp.sub_category)
        """
    )
    assert _rows(got) == _rows(q8_sales_rollup_product(spark, sf_dir))
