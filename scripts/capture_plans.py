"""Capture `.explain("formatted")` for registry gates into
plans/<tag>/<gate>_<suffix>.txt (r10 optimization evidence).

Usage:
    python scripts/capture_plans.py --suffix before gate1 gate2 ...
    python scripts/capture_plans.py --suffix after --all-touched
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("gates", nargs="+")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out_dir or os.path.join(here, "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)

    from python_sql_datawarehouse_project_spark import registry
    from python_sql_datawarehouse_project_spark.session import build_session

    spark = build_session(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    for name in args.gates:
        df = queries[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
