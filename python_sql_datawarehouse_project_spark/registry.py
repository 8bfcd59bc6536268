"""Central query/oracle registry aggregated from the operator modules.

Contract (driver): every key in queries() takes (spark, sf_dir) and
returns a DataFrame; oracles() maps the same key to DuckDB SQL over
the pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings) producing identical column
names.  Keys present in queries() but absent from oracles() get a
weaker rows-only check (reserved for non-SQL-expressible operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    analytics,
    asof,
    corpus,
    dedup,
    embquality,
    evals,
    events,
    incremental,
    layout,
    kmeans,
    mix,
    multimodal,
    profiling,
    quality,
    rangejoin,
    recursive,
    similarity,
    skew,
    text,
    tpch,
    udtfs,
    windows,
    windows_extra,
)
from .streaming import dedup as stream_dedup
from .streaming import extras as stream_extras
from .streaming import joins as stream_joins
from .streaming import stateful as stream_stateful
from .streaming import tws as stream_tws
from .streaming import windows as stream_windows

# Module order is load-bearing: the driver's correctness gate checks the
# FIRST 50 registry keys in insertion order.  Round 2's gate cut off
# mid-registry and left every query after quality.qa7 without a driver
# correctness row (VERDICT.md r2, "What's wrong" #1).  Modules whose
# queries had never been driver-checked (windows, recursive, rangejoin,
# similarity, skew, text, streaming, quality.qa8-12) therefore come
# first; the families that were driver-green in r2 and stay covered by
# pytest oracle-parity fill the tail.
#
# ROUND-4 REORDER CHECKLIST: once CORRECTNESS_r03 lands, move every key
# still lacking a driver-green row into the new first-50 window.  The
# never-driver-checked set at end of round 3 (see COVERAGE.md's
# provenance table, "local-parity only" rows 51+): the r3 tail
# additions in profiling, stream_extras, tpch, embquality,
# windows_extra, udtfs, plus the keys appended inside events (ev11-14),
# analytics (q12/q16), mix (ds5/ds6), asof (aj3), and whatever r3's
# window itself failed to green.  provenance.never_driver_green()
# computes the exact list.
_MODULES = (
    windows,
    recursive,
    rangejoin,
    similarity,
    skew,
    text,
    stream_windows,
    stream_stateful,
    stream_joins,
    stream_dedup,
    quality,
    corpus,  # round-3 additions: never driver-checked, must be in window
    layout,
    incremental,
    events,  # ev8 leads its module so it (r2 hash-fail, cast fixed) re-gates
    analytics,
    asof,
    dedup,
    kmeans,
    mix,
    multimodal,
    profiling,  # new r3 tail additions (aj2/cs1/qa13/tx12 live after
    # the window; round 4 reorders them in once r3 rows land)
    stream_extras,  # stream_sliding_windows — same tail rule
    tpch,  # q13-q15/q17 TPC-H report shapes — same tail rule
    embquality,  # emb1 centroid outliers — same tail rule
    windows_extra,  # w6/w7 navigation + RANGE frame — same tail rule
    udtfs,  # tx13 LATERAL Python UDTF — same tail rule
    stream_tws,  # transformWithState twin — registers only where protobuf exists
    evals,  # tx14/sim6 component scoreboards — same tail rule
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES:
        dupes = set(out) & set(m.QUERIES)
        if dupes:
            raise ValueError(f"duplicate query keys: {dupes}")
        out.update(m.QUERIES)
    return out


def oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLES", {}))
    return out
