"""First-occurrence registration on Spark 4's transformWithState API
— the modern arbitrary-state surface (StatefulProcessor + typed state
handles over RocksDB), covering the same semantics as
streaming/stateful.py's applyInPandasWithState twin so both
generations of the state API are verified against one oracle.

Why both exist: applyInPandasWithState is the legacy single-blob
state model (one struct per key); transformWithState gives NAMED,
independently-updatable state primitives (value/list/map state,
timers, TTL) — the API a new stateful operator should target.  The
gate hash-matches the same `GROUP BY user, type MIN(ts)` oracle as
the legacy twin, so migrating an operator between the APIs is
regression-checked by construction.

State design: one ListState("seen") of event-type strings per user —
bounded by the type vocabulary, not event volume, exactly like the
legacy twin.  The same event-time-ordered drain precondition applies
(documented there; asserted in tests/test_streaming.py).

ENVIRONMENT BOUNDARY (the mm2-decoder pattern): transformWithState's
Python<->JVM state protocol rides protobuf, which this sandbox does
not ship (and installs are off-limits) — so this operator is NOT a
registry gate here.  The module is complete and correct against the
documented API; `tests/test_streaming.py::test_tws_first_events_equals_
batch` runs it end-to-end WHEN protobuf is importable and skips
otherwise, so any environment that ships protobuf verifies it with
zero code change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..catalog import table_path
from .stateful import STREAM_FIRST_ORACLE
from .windows import events_stream, run_available_now, stream_run_scope

_OUT_SCHEMA = "user_id long, event_type string, first_ts timestamp"


class FirstEventsProcessor(StatefulProcessor):
    """Emit each (user, event_type)'s first event time exactly once."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getListState("seen", "event_type string")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        seen = {r[0] for r in self._seen.get()} if self._seen.exists() else set()
        new: list[tuple] = []
        for pdf in rows:
            firsts = (
                pdf.groupby("event_type", sort=True)["ts"].min().sort_index()
            )
            for etype, ts in firsts.items():
                if etype not in seen:
                    seen.add(etype)
                    new.append((key[0], etype, ts))
        if new:
            self._seen.appendList([(t,) for _, t, _ in new])
            yield pd.DataFrame(
                new, columns=["user_id", "event_type", "first_ts"]
            )

    def close(self) -> None:
        pass


def first_events_tws(stream: DataFrame) -> DataFrame:
    return (
        stream.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=FirstEventsProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


def stream_first_events_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = table_path(sf_dir, "events")
    with stream_run_scope(spark, src) as stage:
        return run_available_now(
            spark,
            first_events_tws(events_stream(spark, sf_dir, stage)),
            output_mode="append",
        )


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# Registered as a gate only where the runtime can actually execute it.
QUERIES = (
    {"stream_first_events_tws": stream_first_events_tws}
    if _protobuf_available()
    else {}
)
# Same oracle as the legacy-API twin — that equality IS the point.
ORACLES = (
    {"stream_first_events_tws": STREAM_FIRST_ORACLE}
    if _protobuf_available()
    else {}
)
