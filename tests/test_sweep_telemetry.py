"""Sweep-harness health instrumentation (VERDICT r9 #2): the sf10
sweep runner carries the same per-gate noise attribution as bench.py
plus memory telemetry and crash containment.  These tests replay the
r9 incident shape against the harness's pure helpers — no
SparkSession, no sick box required."""

from __future__ import annotations

import importlib.util
import os

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "oraclecheck_sf.py",
)
_spec = importlib.util.spec_from_file_location("oraclecheck_sf", _SCRIPT)
sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sweep)


def test_replayed_contention_flags_bracketed_gates():
    """The r9 shape: a contention window opens while the stream_*
    block is measured (probe before stream_sessions_custom elevated);
    the harness must flag the gates bracketed by that probe — and only
    those — so a 543 s stream gate is attributed to the box, not the
    code."""
    names = [f"q{i:02d}" for i in range(20)] + [
        "stream_sessions_bounded",
        "stream_sessions_custom",
        "stream_sliding_windows",
        "tx1_token_count",
        "w1_dedup_keep_latest",
    ]
    timeline = [
        [names[0], 0.22, 0],
        [names[10], 0.25, 10],
        [names[20], 3.1, 20],  # elevated: box sick entering the block
        ["__end__", 0.24, len(names)],
    ]
    got = sweep._attribution(names, timeline)
    # both neighboring blocks of the elevated probe: gates 10..end
    assert got == sorted(names[10:])


def test_healthy_sweep_flags_nothing():
    names = [f"q{i:02d}" for i in range(25)]
    timeline = [
        [names[0], 0.21, 0],
        [names[10], 0.26, 10],
        [names[20], 0.23, 20],
        ["__end__", 0.25, 25],
    ]
    assert sweep._attribution(names, timeline) == []


def test_attribution_shares_bench_semantics():
    """One set of pinned semantics: the sweep delegates to
    bench._suspect_gates rather than forking the logic."""
    import bench

    names = [f"g{i}" for i in range(30)]
    tl = [
        [names[0], 0.2, 0],
        [names[10], 1.9, 10],
        [names[20], 0.2, 20],
        ["__end__", 0.2, 30],
    ]
    assert sweep._attribution(names, tl) == bench._suspect_gates(names, tl)


def test_gc_summary_digests_unified_logging(tmp_path):
    log = tmp_path / "gc.log"
    log.write_text(
        "[2026-08-16T01:00:00.000+0000][1.234s][info][gc] GC(0) "
        "Pause Young (Normal) (G1 Evacuation Pause) 512M->128M(8192M) 3.2ms\n"
        "[2026-08-16T01:00:05.000+0000][6.234s][info][gc] GC(1) "
        "Pause Full (G1 Compaction Pause) 7900M->6100M(8192M) 812.0ms\n"
        "[2026-08-16T01:00:09.000+0000][9.000s][info][gc] GC(2) "
        "Pause Young (Normal) (G1 Evacuation Pause) 6400M->6200M(8192M) 4.1ms\n"
    )
    s = sweep._gc_summary(str(log))
    assert s["n_pauses"] == 3
    assert s["n_full_gc"] == 1
    assert s["max_heap_before_mb"] == 7900
    assert s["max_heap_after_mb"] == 6200


def test_gc_summary_tolerates_missing_file(tmp_path):
    s = sweep._gc_summary(str(tmp_path / "absent.log"))
    assert "error" in s


def test_java_rss_probe_returns_nonnegative_int():
    v = sweep._java_rss_mb()
    assert isinstance(v, int) and v >= 0
