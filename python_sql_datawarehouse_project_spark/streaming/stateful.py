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
    pdf = pdf.sort_values("ts", kind="mergesort")
    ts = pdf["ts"].tolist()
    units = [int(v.scaleb(6)) for v in pdf["value_dec"]]
    if state.exists:
        cur = list(state.get)  # [start, last_ts, n, units]
    else:
        cur = None
    out = []
    for t, u in zip(ts, units):
        if cur is not None and t - cur[1] > gap:
            out.append(
                (key[0], cur[0], cur[1] + gap, cur[2], cur[3] / 1e6)
            )
            cur = None
        if cur is None:
            cur = [t, t, 1, u]
        else:
            cur[1], cur[2], cur[3] = t, cur[2] + 1, cur[3] + u
    state.update(tuple(cur))
    state.setTimeoutTimestamp(
        int(pd.Timestamp(cur[1]).value // 1_000_000) + _GAP_MS
    )
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "total_value",
            ],
        )


def sessions_custom(stream: DataFrame) -> DataFrame:
    from .windows import WATERMARK

    return (
        stream.select("user_id", "ts", "value_dec")
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
