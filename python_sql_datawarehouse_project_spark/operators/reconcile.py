"""Snapshot reconciliation — the two relational shapes the registry
still lacked: FULL OUTER join and row-level set operations
(INTERSECT / EXCEPT).  Both are the "what changed between two
versions of this table?" primitives a warehouse uses to audit a
reload, a backfill, or two pipeline variants against each other
(the reference's re-runnable batch loads make exactly this diff the
natural acceptance check; its procs stop at row counts —
scripts/load_to_bronze.py logs counts, never a diff).

  q40_snapshot_diff   per-customer revenue, 1996 snapshot vs 1997
                      snapshot, FULL OUTER joined and classified
                      added / removed / changed / unchanged — the
                      data-diff report
  q41_set_ops         customer-key set algebra across the same two
                      years: INTERSECT (both) and EXCEPT (each side
                      only), tagged and unioned into one frame

Cross-engine determinism: revenue through DECIMAL(18,4) sums cast to
DOUBLE at publish (identical operand trees), so the changed/unchanged
DOUBLE equality compares identical bits; set membership is key-only
integer logic.

Scale notes (100 TB):
  * Both snapshots aggregate to customer grain BEFORE the full-outer
    join: the join input is |customers|, not |lineitem|, and the two
    aggregates shuffle on the SAME key the join needs, so Spark
    plans the join zero-exchange on top of the aggregate outputs
    (pinned in test_plans: exactly two exchanges, both aggregate
    partials).
  * The set-op gate keeps only the key column through the
    distinct/semi/anti machinery — no payload ever shuffles.
  * Classification is a projection; the diff never materializes a
    wide both-sides row beyond the joined aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..star import SALES_DECIMAL

SNAP_A = ("1996-01-01", "1997-01-01")
SNAP_B = ("1997-01-01", "1998-01-01")


def _year_revenue(
    spark: SparkSession, sf_dir: str, lo: str, hi: str, alias: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(f"{lo} 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{hi} 00:00:00").cast("timestamp"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                ).cast(SALES_DECIMAL)
            )
            .cast("double")
            .alias(alias)
        )
    )


def _sql_year_revenue(lo: str, hi: str, alias: str) -> str:
    return f"""
    SELECT o.o_custkey,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                         AS {SALES_DECIMAL})) AS DOUBLE) AS {alias}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '{lo} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{hi} 00:00:00'
    GROUP BY 1
    """


# -- q40: FULL OUTER data-diff ----------------------------------------
def q40_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue 1996 vs 1997, FULL OUTER joined: customers in
    only one year classify added/removed, shared customers
    changed/unchanged.  The general two-snapshot diff — run it over
    any keyed aggregate of an old and new load to audit a backfill."""
    a = _year_revenue(spark, sf_dir, *SNAP_A, "rev_a")
    b = _year_revenue(spark, sf_dir, *SNAP_B, "rev_b")
    j = a.join(b, "o_custkey", "full_outer")
    status = (
        F.when(F.col("rev_a").isNull(), F.lit("added"))
        .when(F.col("rev_b").isNull(), F.lit("removed"))
        .when(F.col("rev_a") == F.col("rev_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("o_custkey", "rev_a", "rev_b", status.alias("status"))


Q40_ORACLE = f"""
WITH a AS ({_sql_year_revenue(*SNAP_A, "rev_a")}),
b AS ({_sql_year_revenue(*SNAP_B, "rev_b")})
SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
       a.rev_a, b.rev_b,
       CASE WHEN a.rev_a IS NULL THEN 'added'
            WHEN b.rev_b IS NULL THEN 'removed'
            WHEN a.rev_a = b.rev_b THEN 'unchanged'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
"""


# -- q41: INTERSECT / EXCEPT membership -------------------------------
def q41_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level set algebra over the two years' customer-key sets:
    INTERSECT tags 'both', EXCEPT each way tags the exclusive sides.
    One frame out, one row per (key, side)."""

    def keys(lo: str, hi: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").where(
            (F.col("o_orderdate") >= F.lit(f"{lo} 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{hi} 00:00:00").cast("timestamp"))
        )
        return orders.select("o_custkey")

    a, b = keys(*SNAP_A), keys(*SNAP_B)
    return (
        a.intersect(b)
        .select("o_custkey", F.lit("both").alias("side"))
        .unionByName(
            a.subtract(b).select("o_custkey", F.lit("only_a").alias("side"))
        )
        .unionByName(
            b.subtract(a).select("o_custkey", F.lit("only_b").alias("side"))
        )
    )


def _sql_keys(lo: str, hi: str) -> str:
    return (
        f"SELECT o_custkey FROM orders "
        f"WHERE o_orderdate >= TIMESTAMP '{lo} 00:00:00' "
        f"AND o_orderdate < TIMESTAMP '{hi} 00:00:00'"
    )


Q41_ORACLE = f"""
SELECT o_custkey, 'both' AS side
FROM ({_sql_keys(*SNAP_A)} INTERSECT {_sql_keys(*SNAP_B)})
UNION ALL
SELECT o_custkey, 'only_a' AS side
FROM ({_sql_keys(*SNAP_A)} EXCEPT {_sql_keys(*SNAP_B)})
UNION ALL
SELECT o_custkey, 'only_b' AS side
FROM ({_sql_keys(*SNAP_B)} EXCEPT {_sql_keys(*SNAP_A)})
"""


QUERIES = {
    "q40_snapshot_diff": q40_snapshot_diff,
    "q41_set_ops": q41_set_ops,
}

ORACLES = {
    "q40_snapshot_diff": Q40_ORACLE,
    "q41_set_ops": Q41_ORACLE,
}
