"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the JVM-side noop sink (no collect, no
Python-side row traffic) so timings measure the real plan: scan +
shuffle + agg/window, the same work a cluster would do per partition.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from python_sql_datawarehouse_project_spark.session import build_session

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    from python_sql_datawarehouse_project_spark import registry

    queries = registry.queries()

    timings: dict[str, float] = {}
    # Warm the JVM, the Python/Arrow worker pool and every table's
    # parquet footer + page cache once, so per-query numbers measure
    # execution, not first-touch initialization.
    from python_sql_datawarehouse_project_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    next(iter(queries.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    total = 0.0
    for name in sorted(queries):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
