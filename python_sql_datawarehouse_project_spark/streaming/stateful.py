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

QUERIES = {"stream_first_events": stream_first_events}
ORACLES = {"stream_first_events": STREAM_FIRST_ORACLE}
