"""Data-quality aggregates as registry queries — the row-validation
shapes of SURVEY.md §2.2 P8 / §2.4 A8-A10 exercised over the test
tables so the driver's oracle gate covers them (the pipeline-side
implementations live in sources/validation.py and run per-ingest).

  qa1_null_profile   single-pass per-column null/blank counts (A9:
                     the reference loops one DuckDB query per column,
                     validate_row.py:403-411; here ONE aggregation)
  qa2_dup_keys       composite-key duplicate groups (A8/A10 HAVING
                     probe, Methods_crm_cust_info.sql:4-9)
  qa3_referential    anti-join orphan probe (J6,
                     Methods_crm_sales_details.sql:33-37)

Scale: qa1 is a map-side partial aggregate to ONE row (no shuffle of
data, only of partial states).  qa2 is one hash shuffle on the key.
qa3 is a broadcast-able anti-join (orders' custkey set is the small
side at dim scale; at fact scale Catalyst picks shuffled hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


# -- qa1: single-pass null/blank profile ------------------------------
_QA1_COLS = ("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")


def qa1_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("total_rows")] + [
        F.count(
            F.when(
                F.col(c).isNull() | (F.trim(F.col(c).cast("string")) == ""), 1
            )
        ).alias(f"bad_{c}")
        for c in _QA1_COLS
    ]
    return orders.agg(*aggs)


QA1_ORACLE = f"""
SELECT
    COUNT(*) AS total_rows,
    {", ".join(
        f"COUNT(CASE WHEN {c} IS NULL OR trim(CAST({c} AS VARCHAR)) = '' "
        f"THEN 1 END) AS bad_{c}"
        for c in _QA1_COLS
    )}
FROM orders
"""


# -- qa2: duplicate composite keys (HAVING probe) ---------------------
def qa2_dup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


QA2_ORACLE = """
SELECT l_orderkey, l_linenumber, COUNT(*) AS n
FROM lineitem
GROUP BY 1, 2
HAVING COUNT(*) > 1
"""


# -- qa3: referential-integrity anti-join (J6) ------------------------
def qa3_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )


QA3_ORACLE = """
SELECT o_custkey, COUNT(*) AS n_orphans
FROM orders o
WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
)
GROUP BY 1
"""

QUERIES = {
    "qa1_null_profile": qa1_null_profile,
    "qa2_dup_keys": qa2_dup_keys,
    "qa3_referential": qa3_referential,
}
ORACLES = {
    "qa1_null_profile": QA1_ORACLE,
    "qa2_dup_keys": QA2_ORACLE,
    "qa3_referential": QA3_ORACLE,
}
