"""sf10 probe for stream_session_windows (VERDICT r7 #3).

PERF.md r7 finding: the built-in session_window drain WEDGES at sf10
when one AvailableNow batch carries all 10M events — 9.5M session
states hit the state-store merge/commit in a single micro-batch,
reproduced at 4 and 32 state partitions AND in append mode, so the
boundary is per-batch state count, not output-mode re-emission.

This probe tests the two escapes the verdict names:

  (a) BOUNDED DRAIN — the production shape: the source arrives as
      TIME-ORDERED slices (here: the sf10 events table re-written as
      N mtime-ascending parquet files), maxFilesPerTrigger=1, APPEND
      mode.  The watermark advances between micro-batches, so closed
      sessions are emitted and EVICTED as the drain walks forward;
      per-batch live state is ~(10M/N) events' worth of sessions
      (~9.5M/N ≈ 150k at N=64) instead of 9.5M.  Correctness gate:
      the emitted closed region (session_end < final watermark) must
      hash-match the batch twin restricted to the same region.

  (b) PROVIDER SWAP — RocksDB state store vs the default HDFS-backed
      store on the SAME bounded drain (and optionally the single-file
      wedge shape with --single-file, bounded by --timeout-min).

Writes a JSON line per configuration; paste the table into PERF.md.

Usage:
    python scripts/probe_stream_sessions_sf10.py \
        [--sf-dir /root/repo/.scratch/sf10] [--slices 64] \
        [--providers hdfs,rocksdb] [--single-file] [--timeout-min 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def slice_events(src_parquet: str, out_dir: str, n: int) -> None:
    """Re-write the events table as n time-ordered parquet files with
    ascending mtimes, so the file stream source (which orders by file
    timestamp) replays them oldest-first — the arrival order a real
    ingest directory would have."""
    import duckdb

    if os.path.isdir(out_dir) and len(os.listdir(out_dir)) == n:
        return
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    con.execute(
        f"CREATE TEMP TABLE ev AS SELECT *, ntile({n}) OVER (ORDER BY ts) "
        f"AS _slice FROM read_parquet('{src_parquet}')"
    )
    for i in range(1, n + 1):
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        con.execute(
            f"COPY (SELECT * EXCLUDE (_slice) FROM ev WHERE _slice = {i} "
            f"ORDER BY ts) TO '{path}' (FORMAT PARQUET)"
        )
        # mtime must ascend with slice order for oldest-first replay
        t = time.time() - (n - i)
        os.utime(path, (t, t))
    con.close()


def build_spark(provider: str, partitions: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName(f"probe-sessions-{provider}")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            ROCKSDB if provider == "rocksdb" else HDFS,
        )
        # same scope-off the bounded bench drains use
        .config(
            "spark.sql.streaming.stateStore.formatValidation.enabled",
            "false",
        )
        .getOrCreate()
    )


def run_drain(spark, sliced_dir: str, schema, timeout_min: float) -> dict:
    """Append-mode bounded drain over the sliced dir; returns timing +
    the closed-region result hash."""
    import uuid

    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.operators.events import (
        SESSION_GAP_MIN,
    )
    from python_sql_datawarehouse_project_spark.streaming.windows import (
        WATERMARK,
        VALUE_DEC,
    )

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(sliced_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    stream = raw.withColumn("value_dec", F.col("value").cast(VALUE_DEC))
    sessions = (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_dec").cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    qname = f"probe_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join("/tmp", "probe-ckpt", qname)
    t0 = time.perf_counter()
    q = (
        sessions.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        ok = q.awaitTermination(timeout=timeout_min * 60)
        if not ok:
            q.stop()
            return {"wall_s": None, "wedged_after_s": timeout_min * 60}
        wall = time.perf_counter() - t0
        progress = q.recentProgress or []
        max_state = max(
            (
                so.get("numRowsTotal", 0)
                for p in progress
                for so in (p.get("stateOperators") or [])
            ),
            default=0,
        )
        return {
            "wall_s": round(wall, 1),
            "n_batches": len(progress),
            "max_state_rows": max_state,
            "table": qname,
        }
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def region_hash(spark, df, cutoff: str) -> tuple[int, int]:
    """(rows, order-insensitive hash) of the closed region.

    MATERIALIZES df before filtering — found the hard way: Spark
    4.1.2 pushes a `session_end < cutoff` predicate BELOW the batch
    session-window MERGE (it treats the window struct as a per-row
    deterministic expression), so the filter drops individual EVENTS
    whose per-event window end crosses the cutoff and the merge then
    emits a truncated bogus session from the survivors.  Reproduced:
    sf0.1 user 1049, events 22:22:33/22:33:02 (10.5 min apart, one
    session ending 23:03:02 >= cutoff) came back as a single-event
    session ending 22:52:33 < cutoff.  The same unsound rewrite turns
    a keys-only distinct over a batch session_window into per-event
    windows (drops the merge aggregate entirely).  localCheckpoint
    severs the lineage so the filter runs over the materialized,
    correctly merged result."""
    from pyspark.sql import functions as F

    closed = df.localCheckpoint(eager=True).where(
        F.col("session_end") < F.lit(cutoff).cast("timestamp")
    )
    row = closed.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.conv(
                    F.md5(
                        F.concat_ws(
                            "\x1f",
                            *[F.col(c).cast("string") for c in closed.columns],
                        )
                    ).substr(1, 15),
                    16,
                    10,
                ).cast("decimal(38,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return row["n"], int(row["h"])


def batch_twin(spark, src_parquet: str):
    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.operators.events import (
        SESSION_GAP_MIN,
    )
    from python_sql_datawarehouse_project_spark.streaming.windows import (
        VALUE_DEC,
    )

    raw = spark.read.parquet(src_parquet)
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    ev = raw.withColumn("value_dec", F.col("value").cast(VALUE_DEC))
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_dec").cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scratch/sf10")
    ap.add_argument("--slices", type=int, default=64)
    ap.add_argument("--providers", default="hdfs,rocksdb")
    ap.add_argument("--partitions", type=int, default=4)
    ap.add_argument("--single-file", action="store_true")
    ap.add_argument("--timeout-min", type=float, default=10.0)
    args = ap.parse_args()

    src = os.path.join(args.sf_dir, "events.parquet")
    # ALWAYS under the repo scratch dir — /root/testdata is read-only
    # territory even when --sf-dir points into it.
    sliced = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"{os.path.basename(args.sf_dir.rstrip('/'))}_events_sliced{args.slices}",
    )
    print(f"slicing {src} -> {sliced} ({args.slices} files)", flush=True)
    slice_events(src, sliced, args.slices)

    results = []
    for provider in args.providers.split(","):
        spark = build_spark(provider, args.partitions)
        spark.sparkContext.setLogLevel("ERROR")
        schema = spark.read.parquet(src).schema
        src_dir = args.sf_dir if args.single_file else sliced
        mode = "single-file" if args.single_file else f"sliced{args.slices}"
        print(f"=== {provider} / {mode} ===", flush=True)
        r = run_drain(spark, src_dir if not args.single_file else src, schema,
                      args.timeout_min)
        rec = {"provider": provider, "mode": mode, **{k: v for k, v in r.items() if k != "table"}}
        if r.get("wall_s") is not None:
            # closed region = strictly older than final watermark
            # (max ts - watermark, truncated the way Spark computes it)
            from pyspark.sql import functions as F

            max_ts = (
                spark.read.parquet(src)
                .select(F.max(F.col("ts").cast("timestamp")))
                .first()[0]
            )
            import datetime as dt

            # floor to whole seconds: Spark's final watermark is
            # ms-truncated max event time - delay, so a second-floored
            # cutoff is <= the watermark — every session in the region
            # was emitted, and both sides filter on the same literal.
            cutoff = (max_ts - dt.timedelta(hours=1)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
            drained = spark.table(r["table"])
            n_s, h_s = region_hash(spark, drained, cutoff)
            n_b, h_b = region_hash(spark, batch_twin(spark, src), cutoff)
            rec.update(
                stream_rows=n_s,
                batch_rows=n_b,
                hash_match=(n_s == n_b and h_s == h_b),
            )
        results.append(rec)
        print(json.dumps(rec), flush=True)
        spark.stop()
    print("SUMMARY " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
