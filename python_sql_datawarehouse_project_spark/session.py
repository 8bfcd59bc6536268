"""SparkSession factory.

Defaults are chosen for the dual design point in BASELINE.json:
correctness-tested on local[N] but architected for a 1000-executor
cluster reading ~100 TB.  Everything scale-relevant is a plain Spark
conf so a cluster deployment overrides via spark-submit --conf.

Key choices (SURVEY.md §4):
  * AQE on: runtime join-strategy switching, skew-join splitting and
    post-shuffle partition coalescing replace hand-tuned partition
    counts when data volume varies by 1000x between test and prod.
  * Dynamic partition overwrite: the reference's idempotency unit is
    "DELETE WHERE dwh_batch_id = X; INSERT" (reference
    scripts/load_to_bronze.py:590-604); with batch-partitioned tables
    dynamic overwrite gives identical exactly-once re-run semantics.
  * Arrow enabled: every pandas_udf / applyInPandas extension operator
    moves data via Arrow batches, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "python-sql-datawarehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- adaptive execution: the scale story ------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- shuffle sizing --------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # 128 MB input splits: a 100 TB table fans out to ~800k tasks,
        # which a 1000-executor cluster drains without straggler blowup.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # -- idempotent batch overwrite (reference delete+insert) ------
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # -- Arrow for all pandas-UDF extension operators --------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- broadcast: dims in both the reference workload (37-row
        # category table) and TPC-H (region/nation/supplier/part at
        # dim scale) are far below this; 64 MB is safe with 4 GB+
        # executors and removes every fact-side dim shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ANSI off: reference semantics are permissive (silent NULL on
        # bad casts, e.g. yyyymmdd=0 -> NULL, SURVEY.md §2.8 R4).
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Pin loopback: the sandbox resolver is a black hole, so any
        # JVM hostname lookup that misses /etc/hosts stalls for the
        # full DNS timeout.  Irrelevant on a real cluster (overridden
        # by spark-submit), critical for local determinism.
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_active_or_build(**kwargs) -> SparkSession:
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session(**kwargs)
