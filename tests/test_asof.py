"""asof_join_backward semantics beyond the aj1 gate shape: a seeded
dense-collision dataset (few keys, few timestamps -> many exact ties
and probe-equals-right-time cases) checked row-for-row against a
brute-force Python reference, plus the explicit tie-break contract."""

from __future__ import annotations

import random

from python_sql_datawarehouse_project_spark.operators.asof import (
    asof_join_backward,
)


def _brute_force(probes, rights):
    out = []
    for pk, pt, pid in probes:
        best = None
        for rk, rt, tb, val in rights:
            if rk == pk and rt <= pt:
                cand = (rt, tb, val)
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        out.append((pid, best[2] if best else None))
    return dict(out)


def test_asof_matches_brute_force_under_dense_ties(spark):
    rng = random.Random(42)
    # 4 keys x 8 timestamps: plenty of duplicate (key, t) pairs on
    # both sides, probes landing exactly ON right timestamps, and
    # keys with no right rows at all
    rights = [
        (rng.randrange(4), rng.randrange(8), tb, rng.randrange(1000))
        for tb in range(60)
    ]
    probes = [
        (rng.randrange(5), rng.randrange(9), pid)  # key 4 never matches
        for pid in range(40)
    ]
    r_df = spark.createDataFrame(
        rights, "k int, t int, tb int, payload int"
    )
    p_df = spark.createDataFrame(probes, "pk int, pt int, pid int")
    got = asof_join_backward(
        p_df,
        r_df,
        probe_key="pk",
        right_key="k",
        probe_time="pt",
        right_time="t",
        payload={"val": "payload"},
        right_tiebreak="tb",
    ).collect()
    want = _brute_force(probes, rights)
    assert len(got) == len(probes)
    for row in got:
        assert row["val"] == want[row["pid"]], row


def test_asof_tie_break_takes_highest_tiebreak(spark):
    rights = [(1, 10, 1, 111), (1, 10, 2, 222)]  # same key, same time
    probes = [(1, 10, 0)]  # probe exactly at the tied timestamp
    got = asof_join_backward(
        spark.createDataFrame(probes, "pk int, pt int, pid int"),
        spark.createDataFrame(rights, "k int, t int, tb int, payload int"),
        probe_key="pk",
        right_key="k",
        probe_time="pt",
        right_time="t",
        payload={"val": "payload"},
        right_tiebreak="tb",
    ).collect()
    assert len(got) == 1 and got[0]["val"] == 222
