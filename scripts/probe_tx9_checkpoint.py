"""Measure tx9's checkpointed bigram-type table across SFs (ADVICE
r9 #5: the eager localCheckpoint materializes the UNFILTERED
bigram-grain count table, whose row count grows with the corpus under
Heaps' law — verify the actual size so the docstring's trade is a
measured claim, not an assumption).

Reports, per SF dir given: distinct bigram types (= checkpointed
rows), the post-filter survivor count (w2 non-null AND c_xy >=
BIGRAM_MIN_COUNT), total token occurrences (the stream the aggregate
collapses), and the checkpoint's in-memory size from the storage
layer (3 columns: 2 strings + int64).

Usage:
    python scripts/probe_tx9_checkpoint.py /root/testdata/sf0.1 \
        /root/repo/.scratch/sf1 /root/repo/.scratch/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.catalog import load_table
    from python_sql_datawarehouse_project_spark.operators.text import (
        BIGRAM_MIN_COUNT,
        _tokens,
    )
    from python_sql_datawarehouse_project_spark.session import build_session

    spark = build_session(app_name="probe-tx9", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sys.argv[1:]:
        toks = load_table(spark, sf_dir, "documents").select(
            _tokens(F.col("text")).alias("tk")
        )
        stream = toks.where(F.size("tk") >= 1).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tk") - 1),
                    lambda i: F.struct(
                        F.get("tk", i).alias("w1"),
                        F.get("tk", i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        t0 = time.perf_counter()
        bc_all = (
            stream.select("p.w1", "p.w2")
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c_xy"))
            .localCheckpoint(eager=True)
        )
        sec = round(time.perf_counter() - t0, 1)
        n_types = bc_all.count()
        n_tokens = bc_all.agg(F.sum("c_xy")).first()[0]
        n_kept = bc_all.where(
            F.col("w2").isNotNull() & (F.col("c_xy") >= BIGRAM_MIN_COUNT)
        ).count()
        # storage footprint of the checkpointed RDD, from the block
        # manager (sums every cached block of this RDD)
        rdd_id = bc_all.rdd.id()
        sc = spark.sparkContext
        mem = disk = 0
        for info in sc._jsc.sc().getRDDStorageInfo():
            mem += info.memSize()
            disk += info.diskSize()
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "checkpoint_build_sec": sec,
                    "bigram_types_checkpointed": n_types,
                    "post_filter_rows": n_kept,
                    "token_occurrences": int(n_tokens),
                    "all_cached_mem_bytes": mem,
                    "all_cached_disk_bytes": disk,
                    "rdd_id": rdd_id,
                }
            ),
            flush=True,
        )
        bc_all.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
