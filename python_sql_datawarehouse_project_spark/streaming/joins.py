"""Stream-stream interval join (SURVEY.md §2.9 extension): the
streaming twin of the binned range join (operators/rangejoin.py).

`stream_preorder_pairs` self-joins the events stream: each purchase
pairs with the same user's events in the hour before it.  Both sides
carry a watermark and the join condition carries the time range, so
Spark's symmetric-hash join evicts buffered rows once the watermark
passes `ts + WINDOW` — state is bounded by one window of events per
side, not the stream so far.

INNER stream-stream joins emit each matched pair as soon as both
rows have arrived (no watermark-close wait, unlike append-mode
aggregations — which is why this query emits raw pairs and leaves
aggregation to the batch twin), so draining the bounded source with
AvailableNow yields exactly the batch join's rows and the batch SQL
is the registered oracle.

Scale notes: the join shuffles both streams on user_id once; state
store entries expire with the watermark.  The same plan runs
unbounded with processing-time triggers; a late event beyond the 1 h
watermark is dropped rather than buffered forever — the explicit
lateness contract the batch twin doesn't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table_path
from ..operators.rangejoin import WINDOW_SEC
from .windows import events_stream, run_available_now, stream_run_scope

WATERMARK = "1 hour"


def preorder_pairs(stream: DataFrame) -> DataFrame:
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", WATERMARK)
    )
    hist = stream.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("value").alias("e_value"),
    ).withWatermark("e_ts", WATERMARK)
    return purchases.join(
        hist,
        F.expr(
            f"p_user = e_user AND e_ts >= p_ts - INTERVAL {WINDOW_SEC} SECONDS"
            " AND e_ts < p_ts"
        ),
    ).select("purchase_id", "e_ts", "e_value")


def stream_preorder_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = table_path(sf_dir, "events")
    with stream_run_scope(spark, src) as stage:
        return run_available_now(
            spark,
            preorder_pairs(events_stream(spark, sf_dir, stage)),
            output_mode="append",
        )


STREAM_PAIRS_ORACLE = f"""
SELECT p.event_id AS purchase_id, e.ts AS e_ts, e.value AS e_value
FROM events p JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL {WINDOW_SEC} SECONDS
 AND e.ts < p.ts
WHERE p.event_type = 'purchase'
"""

# -- left-outer stream-stream join -----------------------------------
# The outer gate's result is restricted to a CLOSED time region: a
# stream-stream OUTER join emits its null-padded (cold-start) rows
# only once the watermark passes the row's join window, so purchases
# within (watermark delay + join window) of the stream's end are
# still buffered when the AvailableNow drain stops — and the batch
# oracle would disagree.  The cutoff must be applied to the DRAINED
# OUTPUT, never inside the streaming query: filtering the purchase
# side pre-join caps that side's max event time at the cutoff, and
# since the global watermark is the MIN across watermarked inputs it
# would stall one watermark-delay short of the cutoff — leaving the
# last purchases before the cutoff unflushed forever (observed: one
# missing null row at sf0.001).  Post-drain, the filter is plain
# batch projection and the watermark ran on the FULL stream, miles
# past the cutoff (events span 2024-01-01..01-30 at every SF).
OUTER_CUTOFF = "2024-01-28 00:00:00"


def coldstart_purchases(stream: DataFrame) -> DataFrame:
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", WATERMARK)
    )
    hist = stream.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("value").alias("e_value"),
    ).withWatermark("e_ts", WATERMARK)
    return purchases.join(
        hist,
        F.expr(
            f"p_user = e_user AND e_ts >= p_ts - INTERVAL {WINDOW_SEC} SECONDS"
            " AND e_ts < p_ts"
        ),
        "left_outer",
    ).select("purchase_id", "p_ts", "e_ts", "e_value")


def stream_coldstart_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase pairs
    with the same user's prior-hour events, and purchases with NO
    prior event still emit one null-padded row — the cold-start /
    no-context detector the inner gate cannot express.

    The outer side rides the same symmetric-hash state as the inner
    join; a buffered purchase emits its null row when the watermark
    passes p_ts (nothing can match it anymore).  State stays bounded
    by one window per side, same as the inner gate; the closed-region
    cutoff happens on the drained output (see OUTER_CUTOFF)."""
    src = table_path(sf_dir, "events")
    with stream_run_scope(spark, src) as stage:
        drained = run_available_now(
            spark,
            coldstart_purchases(events_stream(spark, sf_dir, stage)),
            output_mode="append",
        )
    return drained.where(
        F.col("p_ts") < F.lit(OUTER_CUTOFF).cast("timestamp")
    )


STREAM_COLDSTART_ORACLE = f"""
SELECT p.event_id AS purchase_id, p.ts AS p_ts,
       e.ts AS e_ts, e.value AS e_value
FROM events p LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL {WINDOW_SEC} SECONDS
 AND e.ts < p.ts
WHERE p.event_type = 'purchase'
  AND p.ts < TIMESTAMP '{OUTER_CUTOFF}'
"""

QUERIES = {
    "stream_preorder_pairs": stream_preorder_pairs,
    "stream_coldstart_purchases": stream_coldstart_purchases,
}
ORACLES = {
    "stream_preorder_pairs": STREAM_PAIRS_ORACLE,
    "stream_coldstart_purchases": STREAM_COLDSTART_ORACLE,
}
