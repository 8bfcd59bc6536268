"""Materialized-view registry: the reference's nine MVs
(sql/gold/materialized_view.sql:2-149) over the warehouse's gold star,
with FULL-refresh semantics (recompute -> overwrite; reference
MV Refresh Template.sql:33, refresh_mode='FULL' at
materialized_view.sql:161-169).  Spark has no MV object, so refresh is
"run the query, overwrite the output table" — same observable result.

These run over the *pipeline-produced* gold tables (CRM-shaped star),
whereas operators/analytics.py runs the same nine shapes over the
driver's TPC-H-ish star for the oracle gate.  The shapes are the
parity target; both layers share semantics, not code paths.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .warehouse import Warehouse

# Fixed as-of date for churn (reference uses CURRENT_DATE,
# materialized_view.sql:86); injectable for deterministic tests.
DEFAULT_CHURN_AS_OF = None  # None -> current_date()


def _money_sum(col: str):
    """SUM for money columns, routed through the SAME decimal policy as
    the incremental-MV state (mv_incremental._DEC/_STATE_DEC): cast to
    decimal(18,4) before the sum so addition is exact and
    order-independent, re-pin the widened sum to decimal(28,4), cast to
    DOUBLE only at publish.  This is what makes incremental-vs-full
    equality bitwise rather than approximate — a FULL path summing
    doubles directly would differ from the decimal-routed incremental
    path in low-order bits (ADVICE r2)."""
    return (
        F.sum(F.col(col).cast("decimal(18,4)"))
        .cast("decimal(28,4)")
        .cast("double")
    )


# surrogate-key columns per gold table, for history-mode re-keying
_SURROGATES = {
    "fact_sales": ("customer_key", "product_key"),
    "dim_customers": ("customer_key",),
    "dim_products": ("product_key",),
}


def _gold(wh: Warehouse, batch_id: str | None):
    """Gold star for one batch (batch_id given) or ALL history
    (batch_id=None).

    History mode must respect the warehouse's per-batch dim-snapshot
    model: surrogate keys restart at 1 in every batch (plans/gold.py
    assigns them per batch), so a naive cross-batch join on
    `customer_key` would pair batch 2's facts with batch 1's dim rows.
    Each surrogate is therefore qualified with its batch ordinal
    (batch_num * 2^32 + key — exact int64, keys are row_number-sized)
    so every join stays inside its own snapshot, while the group-bys
    unify history by NATURAL keys (customer_id, product_name, ...) as
    a star schema should.  The -1 unknown-member sentinel
    (tools.load_fact_sales_v1.sql:65-66 COALESCE) is preserved
    globally: dims carry no -1 row, so inner joins drop those facts in
    every mode, and mv_delayed_orders_chain's `!= -1` guard keeps
    working."""

    def read(name: str) -> DataFrame:
        df = wh.read_table("gold", name)
        if batch_id is not None:
            return df.filter(F.col("dwh_batch_id") == batch_id).drop(
                "dwh_batch_id"
            )
        # batch ids are "BATCH" + 6-digit counter (pipeline.next_batch_id,
        # reference batch_processing.py:49-56): substring beats a per-row
        # regexp over 60M facts
        bnum = F.substring(F.col("dwh_batch_id"), 6, 10).cast("long")
        for c in _SURROGATES[name]:
            k = F.col(c).cast("long")
            df = df.withColumn(
                c, F.when(k < 0, k).otherwise(bnum * F.lit(1 << 32) + k)
            )
        return df.drop("dwh_batch_id")

    return read("fact_sales"), read("dim_customers"), read("dim_products")


def mv_sales_monthly_productline(wh, batch_id=None) -> DataFrame:
    fs, _, dp = _gold(wh, batch_id)
    return (
        fs.join(dp, "product_key")
        .groupBy(
            F.trunc("order_date", "month").alias("month"),
            "product_name",
            "category",
            "sub_category",
        )
        .agg(_money_sum("sales").alias("total_sales"))
    )


def mv_sales_customer_country(wh, batch_id=None) -> DataFrame:
    fs, dc, _ = _gold(wh, batch_id)
    return (
        fs.join(dc, "customer_key")
        .groupBy(
            "country",
            "customer_id",
            F.concat_ws(
                " ", F.col("customer_firstname"), F.col("customer_lastname")
            ).alias("customer_name"),
        )
        .agg(_money_sum("sales").alias("total_sales"))
    )


def mv_customer_lifetime_value(wh, batch_id=None) -> DataFrame:
    fs, dc, _ = _gold(wh, batch_id)
    return (
        fs.join(dc, "customer_key")
        .groupBy(
            "customer_id",
            F.concat_ws(
                " ", F.col("customer_firstname"), F.col("customer_lastname")
            ).alias("customer_name"),
        )
        .agg(
            _money_sum("sales").alias("lifetime_value"),
            F.countDistinct("order_number").alias("order_count"),
        )
    )


def mv_running_sales_customer(wh, batch_id=None) -> DataFrame:
    fs, dc, _ = _gold(wh, batch_id)
    w = (
        Window.partitionBy("customer_id")
        .orderBy("order_date", "order_number", "sales")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return fs.join(dc, "customer_key").select(
        "customer_id",
        "order_date",
        F.sum(F.col("sales").cast("decimal(18,4)")).over(w)
        .cast("double")
        .alias("running_sales"),
    )


def mv_top3_products_month_country(wh, batch_id=None) -> DataFrame:
    fs, dc, dp = _gold(wh, batch_id)
    per = (
        fs.join(dc, "customer_key")
        .join(dp, "product_key")
        .groupBy(
            F.trunc("order_date", "month").alias("month"),
            "country",
            "product_name",
        )
        .agg(_money_sum("sales").alias("total_sales"))
    )
    w = Window.partitionBy("month", "country").orderBy(F.desc("total_sales"))
    return (
        per.withColumn("rank_sales", F.rank().over(w))
        .filter(F.col("rank_sales") <= 3)
    )


def mv_customer_churn(wh, batch_id=None, as_of=DEFAULT_CHURN_AS_OF) -> DataFrame:
    fs, dc, _ = _gold(wh, batch_id)
    cutoff = (
        F.add_months(F.current_date(), -6)
        if as_of is None
        else F.add_months(F.lit(as_of).cast("date"), -6)
    )
    return (
        fs.join(dc, "customer_key")
        .groupBy("customer_id")
        .agg(
            F.min("order_date").alias("first_purchase"),
            F.max("order_date").alias("last_purchase"),
        )
        .withColumn("is_churn", F.col("last_purchase") < cutoff)
    )


def mv_customer_order_gap(wh, batch_id=None) -> DataFrame:
    fs, dc, _ = _gold(wh, batch_id)
    w = Window.partitionBy("customer_id").orderBy(
        "order_date", "order_number", "sales"
    )
    gaps = (
        fs.join(dc, "customer_key")
        .select(
            "customer_id",
            "order_date",
            F.lag("order_date").over(w).alias("prev_date"),
        )
        .withColumn("order_gap", F.datediff("order_date", "prev_date"))
    )
    return (
        gaps.filter(F.col("prev_date").isNotNull())
        .groupBy("customer_id")
        .agg(F.avg("order_gap").alias("avg_gap_days"))
    )


def mv_sales_rollup_product(wh, batch_id=None) -> DataFrame:
    fs, _, dp = _gold(wh, batch_id)
    return (
        fs.join(dp, "product_key")
        .rollup("product_line", "category", "sub_category")
        .agg(_money_sum("sales").alias("total_sales"))
    )


def mv_delayed_orders_chain(wh, batch_id=None, max_level: int = 3) -> DataFrame:
    """Driver-side recursion (no recursive CTE in Spark); level-capped.
    Reference materialized_view.sql:127-149."""
    from functools import reduce

    fs, _, _ = _gold(wh, batch_id)
    # Exclude the unknown-member sentinel from the chain: the
    # COALESCE(-1) fallback (load_fact_sales) makes every orphan fact
    # row share customer_key = -1, and a self-join on customer_key
    # turns that shared key into a SUPERHUB — measured at sf1: 6
    # delayed -1 seeds x 30k -1 fact rows squared = 1.35B level-3
    # rows, OOM.  Semantically the -1 member is "customer unknown";
    # chaining orders ACROSS unknown customers asserts they belong to
    # the same customer, which is exactly what is not known — so the
    # filter is a correctness refinement, not just a skew guard.
    base = (
        fs.filter(F.col("customer_key") != -1)
        .select(
            "order_number",
            "customer_key",
            "order_date",
            "shipping_date",
            "due_date",
        )
        .persist()
    )
    seed = base.filter(F.col("shipping_date") > F.col("due_date")).select(
        "order_number",
        "customer_key",
        "shipping_date",
        "due_date",
        F.lit(1).alias("level"),
    )
    levels, frontier = [seed], seed
    for lvl in range(2, max_level + 1):
        prev = frontier.select(
            F.col("customer_key").alias("d_ck"),
            F.col("shipping_date").alias("d_ship"),
        )
        frontier = (
            base.join(
                prev,
                (base["customer_key"] == prev["d_ck"])
                & (base["order_date"] > prev["d_ship"]),
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
    from ..operators.recursive import finalize_recursion

    union = reduce(lambda a, b: a.unionByName(b), levels)
    return finalize_recursion(union, [base, *levels])


MVS: dict[str, Callable[..., DataFrame]] = {
    "mv_sales_monthly_productline": mv_sales_monthly_productline,
    "mv_sales_customer_country": mv_sales_customer_country,
    "mv_customer_lifetime_value": mv_customer_lifetime_value,
    "mv_running_sales_customer": mv_running_sales_customer,
    "mv_top3_products_month_country": mv_top3_products_month_country,
    "mv_customer_churn": mv_customer_churn,
    "mv_customer_order_gap": mv_customer_order_gap,
    "mv_sales_rollup_product": mv_sales_rollup_product,
    "mv_delayed_orders_chain": mv_delayed_orders_chain,
}


def refresh_mv(
    wh: Warehouse, name: str, batch_id: str, history: bool = False
) -> tuple[bool, str | None, int]:
    """FULL refresh: recompute and overwrite the MV output table.

    `history=False` recomputes over the named batch only (the
    single-batch pipeline's default, where batch == history);
    `history=True` recomputes over EVERY gold batch — the reference's
    REFRESH MATERIALIZED VIEW semantics (MV Refresh Template.sql:33)
    in a multi-batch warehouse, and the corpus-proportional cost the
    incremental path (plans/mv_incremental.py) exists to avoid."""
    try:
        df = MVS[name](wh, None if history else batch_id)
        n = wh.write_batch(df, "mv", name, batch_id)
        return True, None, n
    except Exception as e:
        return False, str(e), 0
