"""Backward as-of join — attach to each probe row the most recent
right-side row at-or-before its timestamp, per key.

The reference engine has no as-of join (its nearest shape is the
correlated last-row pick in the MV layer); this is a BASELINE.json
training-pipeline extension: feature attribution ("state of the user
when the order happened"), point-in-time-correct feature lookup —
the join that prevents temporal leakage in training-set assembly.

Spark has no ASOF JOIN either, so `asof_join_backward` implements it
as the classic merge formulation, NOT a range join:

  1. tag both sides and union them on (key, t, side, tiebreak);
  2. one hash exchange on key + one in-partition sort;
  3. running `last(payload, ignorenulls)` over
     ROWS UNBOUNDED PRECEDING..CURRENT carries the latest right
     payload forward into each probe row;
  4. keep probe rows only.

Determinism: right rows are totally ordered by (t, tiebreak-unique)
so ties at equal timestamps resolve identically on every engine and
every run.  Probe rows sort AFTER right rows at equal t (src 0 < 1),
giving at-or-before (<=) semantics.

Scale notes: exactly ONE shuffle of |probes| + |right| rows keyed by
the join key — no row expansion, unlike the naive range join whose
intermediate is |probes| x events-per-key.  The window is a running
frame, so Spark streams each partition in sort order with O(1) state
per key.  Skewed keys can be salted by splitting a hot key's probe
stream (the right side must then be replicated per salt); AQE's skew
handling does not apply to windows, so for 100 TB keep key
cardinality high (user-level keys are) or pre-aggregate the right
side to its per-(key, t) last row first — that pre-step is the same
union-window run on a coarser grain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_K, _T, _SRC, _TB = "_asof_k", "_asof_t", "_asof_src", "_asof_tb"


def asof_join_backward(
    probes: DataFrame,
    right: DataFrame,
    probe_key: str,
    right_key: str,
    probe_time: str,
    right_time: str,
    payload: dict[str, str],
    right_tiebreak: str,
) -> DataFrame:
    """Left as-of join: every probe row, plus `payload` (out-name ->
    right-column) from the latest right row with
    right_time <= probe_time and right_key == probe_key; nulls when
    no such row.  `right_tiebreak` must be unique within
    (right_key, right_time) ties for deterministic payloads.
    """
    probe_cols = probes.columns
    tagged_r = right.select(
        F.col(right_key).alias(_K),
        F.col(right_time).alias(_T),
        F.lit(0).alias(_SRC),
        F.col(right_tiebreak).alias(_TB),
        *[F.col(src).alias(out) for out, src in payload.items()],
        *[F.lit(None).alias(c) for c in probe_cols],
    )
    tb_type = dict(tagged_r.dtypes)[_TB]
    tagged_p = probes.select(
        F.col(probe_key).alias(_K),
        F.col(probe_time).alias(_T),
        F.lit(1).alias(_SRC),
        F.lit(None).cast(tb_type).alias(_TB),
        *[F.lit(None).cast(dict(tagged_r.dtypes)[out]).alias(out) for out in payload],
        *probe_cols,
    )
    w = (
        Window.partitionBy(_K)
        .orderBy(_T, _SRC, _TB)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: list[Column] = [
        F.last(out, ignorenulls=True).over(w).alias(out) for out in payload
    ]
    return (
        tagged_r.unionByName(tagged_p)
        .select(*probe_cols, F.col(_SRC).alias(_SRC), *carried)
        .where(F.col(_SRC) == 1)
        .drop(_SRC)
    )


def asof_join_forward(
    probes: DataFrame,
    right: DataFrame,
    probe_key: str,
    right_key: str,
    probe_time: str,
    right_time: str,
    payload: dict[str, str],
    right_tiebreak: str,
) -> DataFrame:
    """Mirror of `asof_join_backward`: the EARLIEST right row with
    right_time >= probe_time per key ("what happened next").  Same
    single-exchange merge plan; the running frame flips to
    CURRENT..UNBOUNDED FOLLOWING with first(ignorenulls), and probes
    sort BEFORE right rows at equal timestamps (src 0 < 1) so
    at-or-after (>=) ties are included.  Ties at equal right_time
    resolve to the smallest tiebreak — the exact twin of the
    backward join's largest-tiebreak rule, both matching their
    LATERAL oracles."""
    probe_cols = probes.columns
    tagged_r = right.select(
        F.col(right_key).alias(_K),
        F.col(right_time).alias(_T),
        F.lit(1).alias(_SRC),
        F.col(right_tiebreak).alias(_TB),
        *[F.col(src).alias(out) for out, src in payload.items()],
        *[F.lit(None).alias(c) for c in probe_cols],
    )
    tb_type = dict(tagged_r.dtypes)[_TB]
    tagged_p = probes.select(
        F.col(probe_key).alias(_K),
        F.col(probe_time).alias(_T),
        F.lit(0).alias(_SRC),
        F.lit(None).cast(tb_type).alias(_TB),
        *[F.lit(None).cast(dict(tagged_r.dtypes)[out]).alias(out) for out in payload],
        *probe_cols,
    )
    w = (
        Window.partitionBy(_K)
        .orderBy(_T, _SRC, _TB)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried: list[Column] = [
        F.first(out, ignorenulls=True).over(w).alias(out) for out in payload
    ]
    return (
        tagged_r.unionByName(tagged_p)
        .select(*probe_cols, F.col(_SRC).alias(_SRC), *carried)
        .where(F.col(_SRC) == 0)
        .drop(_SRC)
    )


# -- gate: last click before each purchase ---------------------------
def aj1_asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the same user's latest click at or
    before it — last-touch attribution, the point-in-time lookup whose
    probe and right timestamps genuinely interleave (events join
    events; the orders table lives in a disjoint era of the test
    data, which would make every payload null)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.where(F.col("event_type") == "click")
    return asof_join_backward(
        purchases,
        clicks,
        probe_key="user_id",
        right_key="user_id",
        probe_time="purchase_ts",
        right_time="ts",
        payload={"last_click_ts": "ts", "last_click_value": "value"},
        right_tiebreak="event_id",
    )


AJ1_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       lc.ts AS last_click_ts, lc.value AS last_click_value
FROM events p LEFT JOIN LATERAL (
    SELECT c.ts, c.value
    FROM events c
    WHERE c.user_id = p.user_id
      AND c.event_type = 'click'
      AND c.ts <= p.ts
    ORDER BY c.ts DESC, c.event_id DESC
    LIMIT 1
) lc ON TRUE
WHERE p.event_type = 'purchase'
"""

# -- gate: next click after each purchase ----------------------------
def aj2_asof_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the same user's earliest click at or
    after it — the post-conversion re-engagement lookup, and the
    forward twin of aj1 (time-to-next-touch feeds churn/retention
    features the same way last-touch feeds attribution)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.where(F.col("event_type") == "click")
    return asof_join_forward(
        purchases,
        clicks,
        probe_key="user_id",
        right_key="user_id",
        probe_time="purchase_ts",
        right_time="ts",
        payload={"next_click_ts": "ts", "next_click_value": "value"},
        right_tiebreak="event_id",
    )


AJ2_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       nc.ts AS next_click_ts, nc.value AS next_click_value
FROM events p LEFT JOIN LATERAL (
    SELECT c.ts, c.value
    FROM events c
    WHERE c.user_id = p.user_id
      AND c.event_type = 'click'
      AND c.ts >= p.ts
    ORDER BY c.ts ASC, c.event_id ASC
    LIMIT 1
) nc ON TRUE
WHERE p.event_type = 'purchase'
"""


# -- gate: tolerance-bounded as-of lookup ----------------------------
AJ3_TOL_DAYS = 2


def aj3_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aj1 with a staleness bound: the latest click counts only if it
    happened within AJ3_TOL_DAYS before the purchase — the "feature
    freshness" cutoff every point-in-time feature store applies (a
    week-old state row is not a valid feature for a realtime model).

    Implemented as a POST-FILTER on the backward as-of result, which
    is exactly equivalent to restricting the lateral window to
    [t - tol, t]: the backward as-of returns the LATEST click <= t,
    so if that one is older than the tolerance, no click exists
    inside the window at all.  The equivalence keeps the
    single-exchange merge plan untouched — no second join, no range
    explosion."""
    base = aj1_asof_last_event(spark, sf_dir)
    within = F.col("last_click_ts") >= F.col("purchase_ts") - F.expr(
        f"INTERVAL {AJ3_TOL_DAYS} DAYS"
    )
    return base.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.when(within, F.col("last_click_ts")).alias("last_click_ts"),
        F.when(within, F.col("last_click_value")).alias("last_click_value"),
    )


AJ3_ORACLE = f"""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       lc.ts AS last_click_ts, lc.value AS last_click_value
FROM events p LEFT JOIN LATERAL (
    SELECT c.ts, c.value
    FROM events c
    WHERE c.user_id = p.user_id
      AND c.event_type = 'click'
      AND c.ts <= p.ts
      AND c.ts >= p.ts - INTERVAL {AJ3_TOL_DAYS} DAY
    ORDER BY c.ts DESC, c.event_id DESC
    LIMIT 1
) lc ON TRUE
WHERE p.event_type = 'purchase'
"""


QUERIES = {
    "aj1_asof_last_event": aj1_asof_last_event,
    "aj2_asof_next_event": aj2_asof_next_event,
    "aj3_asof_tolerance": aj3_asof_tolerance,
}
ORACLES = {
    "aj1_asof_last_event": AJ1_ORACLE,
    "aj2_asof_next_event": AJ2_ORACLE,
    "aj3_asof_tolerance": AJ3_ORACLE,
}
