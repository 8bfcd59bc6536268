"""Binned range join — equi-join on (key, time-bin) + exact range
filter, the scale formulation of temporal interval joins.

The reference engine expresses range predicates as theta joins the
optimizer brute-forces (SURVEY.md §2.3 P7); Spark likewise plans a
raw `key = key AND t BETWEEN lo AND hi` as an equi-join whose ONE
join group per key holds every event the key ever produced — a hot
key's group is unbounded.  Binning the time axis at the window width
and exploding each probe into the (at most two) bins its window
touches turns the join key into (key, bin):

  * candidates per probe are bounded by two bins of events, not the
    key's full history;
  * a hot key's events split across its time bins, so no single
    shuffle partition receives the whole key (temporal skew relief
    that AQE's skew-join split can also exploit);
  * the exact `[t0, t1)` predicate runs post-join on the bounded
    candidate set, inside codegen.

The bin width must equal the window span (one probe → ≤ 2 bins); a
narrower bin multiplies probe replicas, a wider one widens candidate
sets.  For mixed window lengths, bin at the p99 span and route the
tail through a second pass.

Gate rj1 is pre-purchase attribution: per purchase event, the
count/value of the same user's events in the hour before it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .events import VALUE_DEC

WINDOW_SEC = 3600


def rj1_preorder_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    probes = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            F.expr(f"ts - INTERVAL {WINDOW_SEC} SECONDS").alias("w_lo"),
        )
        .select(
            "purchase_id",
            "user_id",
            "p_ts",
            "w_lo",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.floor(F.unix_timestamp("w_lo") / WINDOW_SEC),
                        F.floor(F.unix_timestamp("p_ts") / WINDOW_SEC),
                    )
                )
            ).alias("bin"),
        )
    )
    hist = events.select(
        F.col("user_id").alias("e_user"),
        "ts",
        F.col("value").cast(VALUE_DEC).alias("value_dec"),
        F.floor(F.unix_timestamp("ts") / WINDOW_SEC).alias("bin"),
    )
    return (
        probes.join(
            hist,
            (probes["user_id"] == hist["e_user"])
            & (probes["bin"] == hist["bin"]),
        )
        .where((F.col("ts") >= F.col("w_lo")) & (F.col("ts") < F.col("p_ts")))
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_events_1h"),
            F.sum("value_dec").cast("double").alias("value_1h"),
        )
    )


RJ1_ORACLE = f"""
SELECT p.event_id AS purchase_id,
       COUNT(*) AS n_events_1h,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS value_1h
FROM events p JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL {WINDOW_SEC} SECONDS
 AND e.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1
"""

QUERIES = {"rj1_preorder_attribution": rj1_preorder_attribution}
ORACLES = {"rj1_preorder_attribution": RJ1_ORACLE}
