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
  q42_table_fingerprint  order-independent per-group content checksums
                      (count, BIT_XOR, modular sum, key range) — the
                      merkle-style anti-entropy primitive that scopes
                      q40's full diff to groups whose fingerprints
                      disagree

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
from ..functions import hashing as H
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


# -- q42: order-independent table fingerprint -------------------------
FP_MOD = 1 << 32


def q42_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content fingerprint of the documents table: row
    count, BIT_XOR and mod-2^32 SUM of a canonical row hash, plus the
    key range.  Two tables (a replica, a migrated copy, yesterday's
    snapshot) compare by exchanging |groups| fingerprint rows instead
    of data — the merkle-style anti-entropy check that makes q40's
    full diff necessary only for groups whose fingerprints differ.

    All three accumulators are commutative/associative (XOR, modular
    sum, MIN/MAX), so the result is partitioning- and order-
    independent and map-side combinable — one scan, one |groups|-row
    exchange.  The row hash covers the full row (text via md5, not
    carried).  XOR misses a row present TWICE on one side with another
    row missing; the modular sum catches that, and vice versa.  The
    mod-2^32 slice keeps the int64 sum exact to 2^31 rows per group;
    beyond that (possible at 100 TB) add one intermediate mod level.

    Oracle note: Spark's SUM(long) wraps silently where DuckDB
    promotes to HUGEINT — the r1/r2 oracle-typing bug class — so the
    hash is pre-sliced to 32 bits and the oracle casts its sum back
    to BIGINT."""
    docs = load_table(spark, sf_dir, "documents")
    row_hash = H.md5_long(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("n_chars").cast("string"),
            F.md5(F.col("text")),
        )
    )
    h32 = F.pmod(row_hash, F.lit(FP_MOD))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(h32).alias("xor_fp"),
        F.pmod(F.sum(h32), F.lit(FP_MOD)).alias("sum_fp"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


_FP_HASH_SQL = "mod({h}, {m})".format(
    h=H.sql_md5_long(
        "concat_ws('|', CAST(doc_id AS VARCHAR), lang, "
        "CAST(n_chars AS VARCHAR), md5(text))"
    ),
    m=FP_MOD,
)

Q42_ORACLE = f"""
SELECT source,
       COUNT(*) AS n_rows,
       CAST(bit_xor({_FP_HASH_SQL}) AS BIGINT) AS xor_fp,
       CAST(mod(SUM({_FP_HASH_SQL}), {FP_MOD}) AS BIGINT) AS sum_fp,
       MIN(doc_id) AS min_id,
       MAX(doc_id) AS max_id
FROM documents
GROUP BY source
"""


QUERIES = {
    "q40_snapshot_diff": q40_snapshot_diff,
    "q41_set_ops": q41_set_ops,
    "q42_table_fingerprint": q42_table_fingerprint,
}

ORACLES = {
    "q40_snapshot_diff": Q40_ORACLE,
    "q41_set_ops": Q41_ORACLE,
    "q42_table_fingerprint": Q42_ORACLE,
}
