"""Per-gate noise attribution in bench.py (VERDICT r8 #2).

The r8 driver bench self-certified `noisy_host: false` while dd7 ran
2.7x its close time — run-level calibration cannot see a mid-run
contention window.  `bench._suspect_gates` attributes elevated
timeline probes to the gates they bracket; these tests replay that
incident shape (and the boundary cases) against the pure function, so
the attribution logic is pinned without needing a reproducibly-sick
box.  No SparkSession involved.
"""

from __future__ import annotations

import bench

# a 40-gate run probed every 10 gates, plus the end sentinel
NAMES = [f"g{i:02d}" for i in range(40)]


def _timeline(probes: list[float]) -> list[list]:
    """probes[j] ran before gate 10*j; last entry is the sentinel."""
    out = [[NAMES[10 * j], p, 10 * j] for j, p in enumerate(probes[:-1])]
    out.append(["__end__", probes[-1], len(NAMES)])
    return out


def test_healthy_run_flags_nothing():
    tl = _timeline([0.21, 0.25, 0.31, 0.24, 0.28])
    assert bench._suspect_gates(NAMES, tl) == []


def test_healthy_jitter_under_2x_and_under_abs_floor_not_flagged():
    # 1.8x median but tiny absolute values: single unwarmed probes
    # jitter this much on a healthy box (PERF.md measured 0.21-0.38 s)
    tl = _timeline([0.21, 0.38, 0.22, 0.21, 0.23])
    assert bench._suspect_gates(NAMES, tl) == []


def test_mid_run_sick_window_flags_both_adjacent_blocks():
    # the r8 incident shape: probe before gate 20 elevated (box sick
    # while gates 10..29 were measured) — both neighboring blocks are
    # suspect, nothing else
    tl = _timeline([0.22, 0.24, 1.9, 0.23, 0.25])
    assert bench._suspect_gates(NAMES, tl) == NAMES[10:30]


def test_sick_at_start_flags_first_block_only():
    tl = _timeline([2.1, 0.24, 0.22, 0.23, 0.25])
    assert bench._suspect_gates(NAMES, tl) == NAMES[0:10]


def test_sick_at_end_sentinel_flags_last_block_only():
    tl = _timeline([0.22, 0.24, 0.23, 0.25, 2.4])
    assert bench._suspect_gates(NAMES, tl) == NAMES[30:40]


def test_whole_run_sick_is_run_level_not_attribution():
    # every probe elevated but none >2x the (elevated) median: the
    # run-level noisy-host band (vs TRAILING-run history) owns this
    # case; per-gate attribution correctly stays quiet rather than
    # flagging all gates
    tl = _timeline([1.9, 2.1, 2.0, 1.9, 2.2])
    assert bench._suspect_gates(NAMES, tl) == []


def test_two_sick_windows_union():
    tl = _timeline([1.8, 0.24, 0.23, 1.7, 0.25])
    assert bench._suspect_gates(NAMES, tl) == NAMES[0:10] + NAMES[20:40]


# -- steal-storm attribution (r10): per-gate /proc/stat deltas --------
# The probes bracket BLOCKS, so a hypervisor steal storm contained
# within one gate's wall time is invisible to them (observed twice at
# the r10 baseline: sim7 57.7 s with a healthy 0.203 s probe two gates
# later; sim2 68.3 s in the next run — both 1.5-6 s re-measured at
# idle).  bench._steal_suspects flags the exact gate from its stolen
# ticks instead.


def test_steal_quiet_run_flags_nothing():
    assert bench._steal_suspects({"g": 5.0}, {"g": 10}, cpus=32) == []


def test_steal_storm_inside_one_gate_flags_exactly_it():
    # 60 s gate on 32 cpus = 192k available ticks; 96k stolen = half
    # the box gone — far past the 10% bar
    t = {"fast": 0.4, "victim": 60.0, "after": 2.0}
    s = {"victim": 96_000, "after": 100}
    assert bench._steal_suspects(t, s, cpus=32) == ["victim"]


def test_steal_subsecond_gate_never_flagged():
    # one tick on a 50 ms gate is proportionally huge but meaningless
    assert bench._steal_suspects({"g": 0.05}, {"g": 40}, cpus=32) == []


def test_steal_threshold_is_10pct_of_available_ticks():
    # 10 s * 32 cpus * 100 Hz = 32k ticks available; 3.2k = exactly
    # 10% (not flagged, strict >), 3.3k over the bar (flagged)
    assert bench._steal_suspects({"g": 10.0}, {"g": 3_200}, cpus=32) == []
    assert bench._steal_suspects({"g": 10.0}, {"g": 3_300}, cpus=32) == ["g"]


def test_steal_absolute_floor_keeps_tiny_tick_counts_out():
    # 12% of a 1.5 s gate is only 576 ticks-available*0.12 = 57 ticks
    # -> under the 500-tick floor, not flagged even over the fraction
    assert bench._steal_suspects({"g": 1.5}, {"g": 480}, cpus=10) == []


def test_steal_retry_is_additive_in_history(tmp_path, monkeypatch):
    # r11 steal re-measure policy: flagged gates get ONE end-of-run
    # retry reported in `steal_retry`; the original single-shot
    # `queries` map is untouched (cross-round comparability) and the
    # retry carries its own steal delta so its cleanliness is visible.
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    timings = {"victim": 60.0, "ok": 1.0}
    retry = {"victim": {"sec": 4.2, "steal_ticks": 12}}
    bench._record_history(timings, 0.1, steal_retry=retry)
    import json

    hist = json.loads((tmp_path / "BENCH_HISTORY.json").read_text())
    assert hist[-1]["queries"] == timings  # originals untouched
    assert hist[-1]["steal_retry"] == retry


def test_steal_observed_incidents_flagged():
    # the two real r10 catches, verbatim
    t = {"sim2_lsh_topk": 66.94, "cs1_canonical_selection": 41.202}
    s = {"sim2_lsh_topk": 40_785, "cs1_canonical_selection": 17_118}
    assert bench._steal_suspects(t, s, cpus=32) == [
        "cs1_canonical_selection", "sim2_lsh_topk"]
