"""Recursive delayed-orders chain (reference materialized_view.sql:127-149,
exploratory_data_analysis.sql:148-169 — the WITH RECURSIVE query).

q9 computes the fixpoint as a driver-side loop of join + filter +
unionByName over a bounded number of levels (SURVEY.md §4.2) — the
formulation that controls per-level persistence, bucketed scans and
checkpoint cadence explicitly.  Spark 4 ALSO executes WITH RECURSIVE
natively; q43_recursive_sql below runs the same query as pasted SQL
and is hash-matched against the same oracle.  Semantics mirror Postgres/DuckDB UNION ALL
recursion exactly: each iteration joins the *previous level's* rows
("working table") against the full order set, so the same order can
appear at several levels via different chains.

Order-grain adaptation: the reference's fact carries shipping_date and
due_date per sales row; the TPC-H-ish test schema derives
  shipping_date = MAX(l_shipdate) per order
  due_date      = order_date + 30 days
and a chain step is "a later order of the same customer placed after
the delayed order shipped".

The recursion is level-capped (default 3).  The reference's query is
uncapped, but on data where most orders chain, the row count grows
geometrically (~fanout^level); a cap keeps both the Spark run and the
DuckDB oracle identical AND tractable, and the cap is part of the
declared semantics here (the oracle SQL carries the same cap).

Scale notes: each iteration is one shuffle join on customer_key; the
frontier is persisted per level to stop Spark re-deriving level k-1
while building level k, and lineage stays shallow because every level
re-reads the persisted frontier, not the whole recursion tree.  On a
real cluster, checkpointing every ~5 levels would bound lineage for
deep recursions (SURVEY.md §4.2).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..star import STAR_SQL_CTES

MAX_LEVEL = 3


def finalize_recursion(union: DataFrame, cached: list[DataFrame]) -> DataFrame:
    """Materialize a recursion result off its cached levels, then
    release them.

    The per-level persists are load-bearing only WHILE the union
    computes (level k reuses the cached level k-1 instead of
    re-deriving the whole prefix).  An eager localCheckpoint runs that
    computation once and stores just the final partitions — whose
    lifetime is tied to the returned DataFrame (ContextCleaner frees
    the blocks on GC) — so the frontier caches can be dropped
    immediately and repeated invocations hold no residual storage.
    This also truncates the per-level lineage chain, which is the
    checkpoint cadence a deep recursion needs on a real cluster
    anyway (SURVEY.md §4.2).
    """
    out = union.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist(blocking=False)
    return out


def order_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders |x| lineitem rolled up to order grain — the one genuinely
    big-big join in the warehouse.  When the session has materialized
    the bucketed layout (plans/bucketing.bucketize_star), both scans
    resolve to their bucketed twins and the join + aggregate plan with
    ZERO Exchange (plan-pinned in tests/test_plans.py); otherwise the
    plain parquet scans shuffle once on the order key.  At 100 TB the
    bucketed path is the difference between a per-run lineitem shuffle
    and none."""
    from ..catalog import load_table
    from ..plans.bucketing import bucketed_scan

    orders = bucketed_scan(spark, sf_dir, "orders")
    if orders is None:
        orders = load_table(spark, sf_dir, "orders")
    lineitem = bucketed_scan(spark, sf_dir, "lineitem")
    if lineitem is None:
        lineitem = load_table(spark, sf_dir, "lineitem")
    order_date = F.col("o_orderdate").cast("date")
    return (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"], "inner")
        .groupBy(
            F.col("o_orderkey").alias("order_number"),
            F.col("o_custkey").alias("customer_key"),
            order_date.alias("order_date"),
            F.date_add(order_date, 30).alias("due_date"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("shipping_date"))
    )


def q9_delayed_orders_chain(
    spark: SparkSession, sf_dir: str, max_level: int = MAX_LEVEL
) -> DataFrame:
    out_cols = ["order_number", "customer_key", "shipping_date", "due_date", "level"]
    ships = order_shipments(spark, sf_dir).persist()
    seed = (
        ships.filter(F.col("shipping_date") > F.col("due_date"))
        .select(
            "order_number",
            "customer_key",
            "shipping_date",
            "due_date",
            F.lit(1).alias("level"),
        )
        .persist()
    )
    levels = [seed]
    frontier = seed
    for lvl in range(2, max_level + 1):
        prev = frontier.select(
            F.col("customer_key").alias("d_customer_key"),
            F.col("shipping_date").alias("d_shipping_date"),
        )
        frontier = (
            ships.join(
                prev,
                (ships["customer_key"] == prev["d_customer_key"])
                & (ships["order_date"] > prev["d_shipping_date"]),
                "inner",
            )
            .select(
                "order_number",
                "customer_key",
                "shipping_date",
                "due_date",
                F.lit(lvl).alias("level"),
            )
            .persist()
        )
        levels.append(frontier)
    union = reduce(lambda a, b: a.unionByName(b), levels).select(*out_cols)
    return finalize_recursion(union, [ships, *levels])


Q9_ORACLE = (
    "WITH RECURSIVE "
    + STAR_SQL_CTES
    + f""",
order_shipments AS (
    SELECT
        o_orderkey AS order_number,
        o_custkey  AS customer_key,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(o_orderdate AS DATE) + 30 AS due_date,
        MAX(CAST(l_shipdate AS DATE)) AS shipping_date
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2, 3, 4
),
delayed_orders AS (
    SELECT order_number, customer_key, shipping_date, due_date, 1 AS level
    FROM order_shipments
    WHERE shipping_date > due_date
    UNION ALL
    SELECT os.order_number, os.customer_key, os.shipping_date, os.due_date,
           d.level + 1 AS level
    FROM order_shipments os
    JOIN delayed_orders d
      ON os.customer_key = d.customer_key
     AND os.order_date > d.shipping_date
    WHERE d.level < {MAX_LEVEL}
)
SELECT order_number, customer_key, shipping_date, due_date, level
FROM delayed_orders
"""
)

_RECURSIVE_SQL_BODY = f"""
WITH RECURSIVE order_shipments AS (
    SELECT
        o_orderkey AS order_number,
        o_custkey  AS customer_key,
        CAST(o_orderdate AS DATE) AS order_date,
        CAST(o_orderdate AS DATE) + 30 AS due_date,
        MAX(CAST(l_shipdate AS DATE)) AS shipping_date
    FROM sg_q43_orders
    JOIN sg_q43_lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2, 3, 4
),
delayed_orders AS (
    SELECT order_number, customer_key, shipping_date, due_date, 1 AS level
    FROM order_shipments
    WHERE shipping_date > due_date
    UNION ALL
    SELECT os.order_number, os.customer_key, os.shipping_date, os.due_date,
           d.level + 1 AS level
    FROM order_shipments os
    JOIN delayed_orders d
      ON os.customer_key = d.customer_key
     AND os.order_date > d.shipping_date
    WHERE d.level < {MAX_LEVEL}
)
SELECT order_number, customer_key, shipping_date, due_date, level
FROM delayed_orders
"""


def q43_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WITH RECURSIVE query run NATIVELY: Spark 4
    executes recursive CTEs (UNION ALL recursion, working table =
    previous iteration — the same Postgres/DuckDB semantics the
    reference's materialized_view.sql:127-149 assumes), so the
    delayed-orders chain also runs as PASTED SQL, not only as q9's
    driver-side loop.  Hash-matched against q9's own oracle — and
    thereby against q9 itself — proving the two formulations are the
    same query.

    q9 remains the production path: the loop controls per-level
    persistence, bucketed scans and checkpoint cadence explicitly,
    where the native operator manages its own working-table state.
    MEASURED PENALTY (r5 bench, sf0.1): q43 4.28s vs q9 1.65s — the
    native operator's working-table management is ~2.6x slower than
    the driver loop on the same query and oracle.  Do NOT promote
    q43 into the MV/production path; it exists to pin the SQL
    SURFACE (an analyst can paste the reference's query verbatim
    modulo table names) — the strongest §2.10 parity statement
    available."""
    from ..catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sg_q43_orders"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sg_q43_lineitem"
    )
    return spark.sql(_RECURSIVE_SQL_BODY)


QUERIES = {
    "q9_delayed_orders_chain": q9_delayed_orders_chain,
    "q43_recursive_sql": q43_recursive_sql,
}
ORACLES = {
    "q9_delayed_orders_chain": Q9_ORACLE,
    "q43_recursive_sql": Q9_ORACLE,
}
