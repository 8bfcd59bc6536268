"""Custom stateful streaming operator: first-occurrence event
registration via `applyInPandasWithState` (SURVEY.md §2.9 extension —
the arbitrary-state API, complementing streaming/windows.py's
built-in windowed aggregations).

`stream_first_events` emits, per (user, event_type), the FIRST
event-time seen — the streaming "register each thing once" shape
(exactly-once signup processing, first-touch attribution).  Per-user
state is the set of event types already emitted; a micro-batch emits
a (user, type, min ts-in-batch) row only for types not yet in state.
Because the file source drains batches in event-time order (a later
batch never carries an earlier ts for a type's first occurrence —
asserted for the two-batch case in tests/test_streaming.py), the
drained result equals the batch `GROUP BY user, type MIN(ts)` — which
is the registered DuckDB oracle.

Scale notes: state is one short string-list per user (bounded by the
event-type vocabulary, NOT by event volume) in the state store
(RocksDB on a cluster); each micro-batch shuffles once on user_id.
The same operator runs unbounded with processing-time triggers and a
state TTL via GroupStateTimeout where the vocabulary is open-ended.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import table_path
from .windows import events_stream, run_available_now, stream_run_scope

_OUT_SCHEMA = "user_id long, event_type string, first_ts timestamp"
_STATE_SCHEMA = "seen array<string>"


def _first_events_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user state handler: emit each event type's first-in-batch
    timestamp the first time the type is seen, remember it in state."""
    (seen,) = state.get if state.exists else ([],)
    seen = list(seen)
    out_rows = []
    for pdf in batches:
        firsts = (
            pdf.groupby("event_type", sort=True)["ts"].min().sort_index()
        )
        for etype, ts in firsts.items():
            if etype not in seen:
                seen.append(etype)
                out_rows.append((key[0], etype, ts))
    state.update((seen,))
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["user_id", "event_type", "first_ts"]
        )


def first_events(stream: DataFrame) -> DataFrame:
    return (
        stream.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _first_events_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_first_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = table_path(sf_dir, "events")
    with stream_run_scope(spark, src) as stage:
        return run_available_now(
            spark,
            first_events(events_stream(spark, sf_dir, stage)),
            output_mode="append",
        )


STREAM_FIRST_ORACLE = """
SELECT user_id, event_type, MIN(ts) AS first_ts
FROM events
GROUP BY 1, 2
"""



# -- custom sessionizer: per-USER state instead of per-session --------
# WHY (PERF.md round 7): Spark's built-in session_window WEDGES at
# sf10 — one AvailableNow drain batch carries 9,546,500 session
# states and the state-store session-merge path never finishes a task
# in 30+ min (reproduced at 4 AND 32 state partitions, complete AND
# append modes), while the batch twin computes the same sessions in
# 7.7 s.  This operator re-expresses sessionization through the
# arbitrary-state API with state keyed per USER — ~1M entries at sf10
# instead of 9.5M, one short fixed-width row each — and the session
# merge itself as a vectorized pandas pass over each user's events.
# The gap rule matches ev3's oracle exactly (a gap STRICTLY greater
# than SESSION_GAP_MIN starts a new session; end = last ts + gap).
#
# Emission contract: sessions closed by a later event emit in-batch;
# the final open session per user emits via EventTimeTimeout once the
# watermark passes last_ts + gap (the drain's second batch).  Sessions
# whose timeout the bounded drain's final watermark never reaches are
# handled exactly like joins.OUTER_CUTOFF: the gate filters the
# DRAINED output to session_end < SESS_CUTOFF and the oracle applies
# the same predicate — the closed-region convention for outer/final
# emissions over a bounded replay.
#
# Money math: value_dec (DECIMAL(18,6)) arrives in pandas as exact
# decimal.Decimal; state carries integer MICRO-UNITS (int64: <= 1e15
# for any session, exact), and the emitted double units/1e6 is the
# identical correctly-rounded value both engines' decimal->double
# casts produce at these magnitudes (scaled sums < 2^53 convert
# exactly).
SESS_CUTOFF = "2024-01-28 00:00:00"
_GAP_MS: int
from ..operators.events import SESSION_GAP_MIN  # noqa: E402

_GAP_MS = SESSION_GAP_MIN * 60 * 1000

_SESS_OUT = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_SESS_STATE = "start timestamp, last_ts timestamp, n long, units long"


def _sessions_fn(
    key: tuple, batches, state: GroupState
):
    import pandas as pd  # noqa: PLC0415 — executor-side import

    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)
    if state.hasTimedOut:
        start, last_ts, n, units = state.get
        state.remove()
        yield pd.DataFrame(
            [(key[0], start, last_ts + gap, n, units / 1e6)],
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "total_value",
            ],
        )
        return
    pdf = pd.concat(list(batches), ignore_index=True)
    if pdf.empty:
        return
    # r10 (guide §4.2): the session merge ran as a per-event Python
    # loop over (Timestamp, Decimal) OBJECTS plus a per-row
    # Decimal.scaleb call.  The decimal->micro-units conversion moved
    # upstream into a codegen projection (sessions_custom selects
    # CAST(value_dec * 1000000 AS BIGINT): decimal(18,6) scaled by
    # 10^6 is an exact integer on both paths), and the merge itself
    # is now numpy segment math over int64 nanosecond/micro-unit
    # arrays: break positions from one vectorized gap compare,
    # per-session counts/sums from add.reduceat (exact integer
    # arithmetic — associative, so identical to the loop's running
    # sums), session bounds by index.  Same strict-gap rule, same
    # state/emission contract, bit-identical output (re-verified vs
    # the oracle at sf0.01/sf0.1 and pinned against
    # stream_session_windows by tests/test_streaming.py).
    #
    # Measured honestly (same box, A/B): sf0.1 6.9 -> 5.0-5.3 s; sf10
    # 401.4 -> 372.6 s (-7%).  The sf10 drain is dominated by
    # PER-GROUP machinery — ~1M per-user applyInPandasWithState
    # invocations, each with state round-trip and mini-DataFrame
    # construction — not by the per-event term this rewrite removes,
    # so the win is real but bounded; the per-group term is the
    # framework's, not this function's (the bounded-arrival gate and
    # transformWithState are the documented alternatives at that
    # scale).
    import numpy as np  # noqa: PLC0415 — executor-side import

    pdf = pdf.sort_values("ts", kind="mergesort")
    ts = pdf["ts"].to_numpy()  # datetime64[ns]
    units = pdf["units"].to_numpy(np.int64)
    ts_ns = ts.view("i8")
    gap_ns = _GAP_MS * 1_000_000
    m = len(ts_ns)
    if state.exists:
        s_start, s_last, s_n, s_units = state.get
        state_breaks = (ts_ns[0] - pd.Timestamp(s_last).value) > gap_ns
    else:
        s_start = None
        state_breaks = False
    brk = np.empty(m, dtype=bool)
    brk[0] = False  # group 0 always starts at index 0
    if m > 1:
        brk[1:] = (ts_ns[1:] - ts_ns[:-1]) > gap_ns
    bounds = np.concatenate(([0], np.flatnonzero(brk), [m]))
    g_start, g_end = bounds[:-1], bounds[1:] - 1  # inclusive ends
    g_n = (bounds[1:] - bounds[:-1]).astype(np.int64)
    g_units = np.add.reduceat(units, bounds[:-1])
    merge_state = s_start is not None and not state_breaks
    rows: dict[str, list] = {
        "session_start": [], "session_end": [], "n_events": [],
        "total_value": [],
    }
    if s_start is not None and state_breaks:
        # the carried session closes before the batch's first event
        rows["session_start"].append(s_start)
        rows["session_end"].append(s_last + gap)
        rows["n_events"].append(s_n)
        rows["total_value"].append(s_units / 1e6)
    n_groups = len(g_start)
    for g in range(n_groups - 1):  # all but the last group close
        cont = merge_state and g == 0
        rows["session_start"].append(
            s_start if cont else pd.Timestamp(ts[g_start[g]])
        )
        rows["session_end"].append(pd.Timestamp(ts[g_end[g]]) + gap)
        rows["n_events"].append(int(g_n[g]) + (s_n if cont else 0))
        rows["total_value"].append(
            (int(g_units[g]) + (s_units if cont else 0)) / 1e6
        )
    last = n_groups - 1
    cont = merge_state and last == 0
    cur_start = s_start if cont else pd.Timestamp(ts[g_start[last]])
    cur_last = pd.Timestamp(ts[g_end[last]])
    cur_n = int(g_n[last]) + (s_n if cont else 0)
    cur_units = int(g_units[last]) + (s_units if cont else 0)
    state.update((cur_start, cur_last, cur_n, cur_units))
    state.setTimeoutTimestamp(cur_last.value // 1_000_000 + _GAP_MS)
    if rows["session_start"]:
        out = pd.DataFrame(rows)
        out.insert(0, "user_id", key[0])
        yield out


def sessions_custom(stream: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    from .windows import WATERMARK

    # Micro-units computed in codegen, not per row in Python: a
    # decimal(18,6) times 10^6 is an exact integer, and the BIGINT
    # cast is the same truncation int(Decimal.scaleb(6)) performs —
    # the stateful function receives ready int64s (see _sessions_fn's
    # r10 note).
    return (
        stream.select(
            "user_id",
            "ts",
            F.expr("CAST(value_dec * 1000000 AS BIGINT)").alias("units"),
        )
        .withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessions_fn,
            outputStructType=_SESS_OUT,
            stateStructType=_SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessions_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as a custom per-user stateful operator — the
    scale path where the built-in session_window's per-session state
    wedges (see the module comment; ev3/oracle semantics, pinned
    against stream_session_windows on the closed region in
    tests/test_streaming.py)."""
    from pyspark.sql import functions as F

    src = table_path(sf_dir, "events")
    with stream_run_scope(spark, src) as stage:
        drained = run_available_now(
            spark,
            sessions_custom(events_stream(spark, sf_dir, stage)),
            output_mode="append",
        )
    return drained.where(
        F.col("session_end") < F.lit(SESS_CUTOFF).cast("timestamp")
    )


STREAM_SESSIONS_CUSTOM_ORACLE = f"""
WITH flagged AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL '{SESSION_GAP_MIN} minutes'
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
islands AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM flagged
),
sess AS (
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '{SESSION_GAP_MIN} minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM islands
    GROUP BY user_id, session_no
)
SELECT * FROM sess WHERE session_end < TIMESTAMP '{SESS_CUTOFF}'
"""

QUERIES = {
    "stream_first_events": stream_first_events,
    "stream_sessions_custom": stream_sessions_custom,
}
ORACLES = {
    "stream_first_events": STREAM_FIRST_ORACLE,
    "stream_sessions_custom": STREAM_SESSIONS_CUSTOM_ORACLE,
}
