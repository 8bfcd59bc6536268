"""Window-operator family beyond the MV/EDA set: the cleansing-side
window shapes the reference applies in its silver procs, re-expressed
over the test tables so the oracle harness covers them.

  w1 ROW_NUMBER "keep latest" dedup   (reference
     tools.load_crm_cust_info_v1.sql:102-113 — keep newest record per
     cst_id by cst_create_date DESC; here: newest order per customer)
  w2 LEAD end-dating (SCD2-style)     (reference
     tools.load_crm_prd_info_v1.sql:91-96 — prd_end_dt =
     LEAD(start)-1 day per prd_key; here: per-part ship-version
     end-dating over lineitem)
  w3 unpartitioned ROW_NUMBER surrogate keys (reference
     Integrations/client1/Integration_dim_customers.sql:1-5)

Determinism: w1's reference ORDER BY cst_create_date DESC is tie-broken
here with the natural key, per SURVEY.md §7's "pin a deterministic
tiebreaker" requirement.

Scale: w1/w2 shuffle once on their partition key — same cost class as
any grouped aggregate.  w3 (global row_number) funnels through a
single partition; acceptable for dim-sized inputs only, which is
exactly the reference's use (surrogate keys for dims).  For fact-scale
surrogate keys use zipWithIndex-style two-pass offsets instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table


def w1_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer (ROW_NUMBER ... DESC, keep flag_last=1)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("flag_last", F.row_number().over(w))
        .filter(F.col("flag_last") == 1)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderkey").alias("latest_order_number"),
            F.col("o_orderdate").cast("date").alias("latest_order_date"),
            F.col("o_totalprice").alias("latest_total_price"),
        )
    )


W1_ORACLE = """
SELECT
    o_custkey  AS customer_id,
    o_orderkey AS latest_order_number,
    CAST(o_orderdate AS DATE) AS latest_order_date,
    o_totalprice AS latest_total_price
FROM (
    SELECT *,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
           ) AS flag_last
    FROM orders
) t
WHERE flag_last = 1
"""


def w2_lead_end_dating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style validity ranges: each part's shipment version ends the
    day before its next shipment (NULL for the open current version)."""
    li = load_table(spark, sf_dir, "lineitem")
    versions = li.select(
        F.col("l_partkey").alias("product_id"),
        F.col("l_orderkey").alias("order_number"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_shipdate").cast("date").alias("start_date"),
    )
    w = Window.partitionBy("product_id").orderBy(
        "start_date", "order_number", "line_number"
    )
    return versions.withColumn(
        "end_date", F.date_sub(F.lead("start_date").over(w), 1)
    )


W2_ORACLE = """
SELECT
    l_partkey    AS product_id,
    l_orderkey   AS order_number,
    l_linenumber AS line_number,
    CAST(l_shipdate AS DATE) AS start_date,
    LEAD(CAST(l_shipdate AS DATE)) OVER (
        PARTITION BY l_partkey
        ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber
    ) - 1 AS end_date
FROM lineitem
"""


def w3_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense surrogate keys for a dim via unpartitioned ROW_NUMBER over a
    deterministic order (reference Integration_dim_customers.sql:1-5)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_custkey")
    return customer.select(
        F.row_number().over(w).alias("customer_key"),
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
    )


W3_ORACLE = """
SELECT
    ROW_NUMBER() OVER (ORDER BY c_custkey) AS customer_key,
    c_custkey AS customer_id,
    c_name    AS customer_name
FROM customer
"""


def w4_ntile_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend quartiles via NTILE(4) — the segmentation shape
    (gold/silver tiering) the reference's EDA builds with manual CASE
    bands; NTILE is the general form.

    Determinism: NTILE's tie handling follows the window ORDER BY, so
    the sort carries the customer key as a total-order tiebreaker
    (equal spends would otherwise land in engine-dependent quartiles).
    Scale: spend is a per-customer hash agg (one shuffle); the NTILE
    itself is an unpartitioned window — fine for dim-sized inputs
    (same contract as w3's surrogate keys), and at fact scale the
    same result comes from the qa5-style cumulative-counts percentile
    split instead of a global sort."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_d")
    )
    w = Window.orderBy(F.desc("spend_d"), F.col("o_custkey"))
    return spend.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("spend_d").cast("double").alias("total_spend"),
        F.ntile(4).over(w).alias("spend_quartile"),
    )


W4_ORACLE = """
WITH spend AS (
    SELECT o_custkey,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_d
    FROM orders GROUP BY 1
)
SELECT o_custkey AS customer_id,
       CAST(spend_d AS DOUBLE) AS total_spend,
       NTILE(4) OVER (ORDER BY spend_d DESC, o_custkey) AS spend_quartile
FROM spend
"""


def w5_spend_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's spend percentile via PERCENT_RANK (plus
    CUME_DIST) — the continuous segmentation complement to w4's
    NTILE quartiles.

    Determinism: both functions are rank arithmetic over the window
    ORDER BY — (rank-1)/(n-1) and rank_last/n — so with the total
    (spend, customer) order the doubles are single exact-int
    divisions, bit-identical cross-engine.  Same dim-scale
    unpartitioned-window contract as w3/w4."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_d")
    )
    w = Window.orderBy(F.desc("spend_d"), F.col("o_custkey"))
    return spend.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("spend_d").cast("double").alias("total_spend"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


W5_ORACLE = """
WITH spend AS (
    SELECT o_custkey,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_d
    FROM orders GROUP BY 1
)
SELECT o_custkey AS customer_id,
       CAST(spend_d AS DOUBLE) AS total_spend,
       PERCENT_RANK() OVER (ORDER BY spend_d DESC, o_custkey) AS pct_rank,
       CUME_DIST() OVER (ORDER BY spend_d DESC, o_custkey) AS cume_dist
FROM spend
"""


QUERIES = {
    "w1_dedup_keep_latest": w1_dedup_keep_latest,
    "w2_lead_end_dating": w2_lead_end_dating,
    "w3_surrogate_keys": w3_surrogate_keys,
    "w4_ntile_spend_quartiles": w4_ntile_spend_quartiles,
    "w5_spend_percentile": w5_spend_percentile,
}
ORACLES = {
    "w1_dedup_keep_latest": W1_ORACLE,
    "w2_lead_end_dating": W2_ORACLE,
    "w3_surrogate_keys": W3_ORACLE,
    "w4_ntile_spend_quartiles": W4_ORACLE,
    "w5_spend_percentile": W5_ORACLE,
}
