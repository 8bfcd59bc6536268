"""Diagnostic: per-checkpoint / per-count timing inside the CC-loop
gates (dd7 / cs1 / cs2) by monkeypatching the two materialization
points.  Measurement-only; not part of any gate.

Usage: python scripts/profile_cc_loop.py [sf_dir] [gate ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    gates = sys.argv[2:] or ["dd7_dup_clusters", "cs1_canonical_selection"]

    # Spark 4: pyspark.sql.DataFrame is the abstract facade; the
    # instances are classic.dataframe.DataFrame — patch the concrete one.
    from pyspark.sql.classic.dataframe import DataFrame

    from python_sql_datawarehouse_project_spark.session import build_session
    from python_sql_datawarehouse_project_spark import registry

    spark = build_session(app_name="profile_cc")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    orig_ckpt = DataFrame.localCheckpoint
    orig_count = DataFrame.count

    def timed_ckpt(self, eager=True):
        t0 = time.perf_counter()
        r = orig_ckpt(self, eager=eager)
        print(f"    ckpt eager={eager}: {time.perf_counter() - t0:6.3f}s")
        return r

    def timed_count(self):
        t0 = time.perf_counter()
        r = orig_count(self)
        print(f"    count={r}: {time.perf_counter() - t0:6.3f}s")
        return r

    DataFrame.localCheckpoint = timed_ckpt
    DataFrame.count = timed_count

    # warm: one full pass of the first gate at the smallest SF
    queries[gates[0]](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    print("--- warm done ---")

    for name in gates:
        for rep in range(2):
            print(f"== {name} rep {rep} ==")
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            print(
                f"  build {t1 - t0:6.3f}s  write {t2 - t1:6.3f}s  "
                f"total {t2 - t0:6.3f}s"
            )

    spark.stop()


if __name__ == "__main__":
    main()
