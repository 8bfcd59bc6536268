"""Time individual registry gates at an arbitrary scale-factor
directory (noop sink, same execution forcing as bench.py) without
touching BENCH_HISTORY — the harness behind PERF.md's sf0.1 -> sf1
(-> sf10) scaling tables.

Usage:
    python scripts/time_gates.py --sf-dir /root/repo/.scratch/sf1 \
        [--reps 1] gate1 gate2 ...

Prints one JSON line: {"sf_dir": ..., "timings": {gate: sec}} with
per-gate wall seconds (min over reps).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument(
        "--warm-gate",
        help="gate used for the untimed JVM/codegen warm-up execution "
        "(default: the first timed gate; pick a CHEAP one when timing "
        "an expensive gate in its own process)",
    )
    ap.add_argument("gates", nargs="+")
    args = ap.parse_args()

    from python_sql_datawarehouse_project_spark import registry
    from python_sql_datawarehouse_project_spark.session import build_session

    spark = build_session(app_name="time-gates")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    unknown = [g for g in args.gates if g not in queries]
    if unknown:
        ap.error(f"unknown gates: {unknown}")

    # One warm-up execution so JVM/codegen/Arrow startup is not
    # attributed to the first timed gate.
    warm = args.warm_gate or args.gates[0]
    if warm not in queries:
        ap.error(f"unknown warm gate {warm!r}")
    queries[warm](spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in args.gates:
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            queries[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(min(reps), 3)
        print(f"{name}: {timings[name]} s", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "timings": timings}))


if __name__ == "__main__":
    main()
