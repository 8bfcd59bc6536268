"""Explicit semi-join reduction in front of a big-big shuffle join —
the runtime-filter pattern every 100 TB star join lives on.

  sj1_semijoin_reduced_join   revenue by order priority for
                              lineitems of small parts (p_size <= 2,
                              ~4% of the part dim), with the
                              lineitem⋈orders fact-fact join
                              SEMI-REDUCED before its shuffle

Why this is its own operator and not "just a join": the naive plan
shuffles ALL of lineitem into the lineitem⋈orders sort-merge join and
applies the part predicate afterwards via the part join — at 100 TB
that is ~96% wasted shuffle I/O, the single largest avoidable cost in
a selective star query.  The reduction broadcasts the ~4% surviving
part KEYS (keys only — bytes ~ |dim| * 8, not the dim payload) as a
LEFT SEMI hash join on the scan side of lineitem, so the big exchange
moves only qualifying rows.  This is exactly what Spark's adaptive
runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.enabled)
injects automatically when statistics cooperate; the explicit exact-
key semi join is its deterministic, plan-pinnable form (no stats
dependence, no false positives), and the one to reach for when the
filter column is NOT the join key the optimizer watches.

Plan contract (pinned in tests/test_plans.py): the semi reduction is
a BroadcastHashJoin LeftSemi BELOW the lineitem⋈orders join, and the
big join is a SortMergeJoin (merge-hinted on both sides: at bench SF
orders fits the 64 MB broadcast threshold, but 100 TB orders never
broadcasts — the hint pins the plan the design is FOR, per rj2's
precedent of testing the scale plan, not the small-SF accident).

Money policy: star.py's SALES_DECIMAL routing — exact, order-
independent decimal addition, identical literal trees both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..star import SALES_DECIMAL

SJ1_MAX_SIZE = 2  # p_size cutoff: ~4% of parts survive


def sj1_semijoin_reduced_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_keys = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") <= SJ1_MAX_SIZE)
        .select("p_partkey")
    )
    reduced = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part_keys),
        F.col("l_partkey") == F.col("p_partkey"),
        "leftsemi",
    )
    orders = load_table(spark, sf_dir, "orders")
    joined = reduced.hint("merge").join(
        orders.hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "inner",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                SALES_DECIMAL
            )
        )
        # Exact decimal addition inside the agg, DOUBLE at the output
        # boundary — the registry-wide money routing (star.py, q27):
        # Spark sum(decimal(18,4)) widens to decimal(28,4) while DuckDB
        # widens to DECIMAL(38,4); identical values, different physical
        # types, so the driver's schema/hash layer needs one canonical
        # output type.  The cast is AFTER the exact sum, so no float
        # accumulation-order sensitivity is introduced.
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )


SJ1_ORACLE = f"""
SELECT o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {SALES_DECIMAL}))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= {SJ1_MAX_SIZE})
GROUP BY o_orderpriority
"""


QUERIES = {"sj1_semijoin_reduced_join": sj1_semijoin_reduced_join}
ORACLES = {"sj1_semijoin_reduced_join": SJ1_ORACLE}
