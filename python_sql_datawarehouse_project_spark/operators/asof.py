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


# -- gate: point-in-time last event per order ------------------------
def aj1_asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each order: the latest event of that customer at or before
    the order date (the point-in-time feature-lookup shape)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = load_table(spark, sf_dir, "events")
    return asof_join_backward(
        orders,
        events,
        probe_key="o_custkey",
        right_key="user_id",
        probe_time="o_orderdate",
        right_time="ts",
        payload={"last_event_ts": "ts", "last_event_type": "event_type"},
        right_tiebreak="event_id",
    )


AJ1_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       le.ts AS last_event_ts, le.event_type AS last_event_type
FROM orders o LEFT JOIN LATERAL (
    SELECT e.ts, e.event_type
    FROM events e
    WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    ORDER BY e.ts DESC, e.event_id DESC
    LIMIT 1
) le ON TRUE
"""

QUERIES = {"aj1_asof_last_event": aj1_asof_last_event}
ORACLES = {"aj1_asof_last_event": AJ1_ORACLE}
