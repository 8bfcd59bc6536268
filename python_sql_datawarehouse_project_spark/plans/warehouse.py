"""Warehouse storage: batch-partitioned parquet tables with the
reference's delete-then-insert idempotency, expressed as dynamic
partition overwrite (SURVEY.md §1.5).

Every bronze/silver/gold table is partitioned by dwh_batch_id; writing
a batch replaces exactly that partition ("DELETE WHERE dwh_batch_id =
X; INSERT", reference tools.load_crm_cust_info_v1.sql:58-62 and
scripts/load_to_bronze.py:590-604) and re-runs are exactly-once.  At
100 TB this is also the scan-pruning story: every proc-equivalent
reads one partition, never the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_COL = "dwh_batch_id"


class Warehouse:
    """A layered parquet warehouse rooted at a directory.

    Tables live at {root}/{layer}/{name}/ partitioned by dwh_batch_id.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, layer: str, name: str) -> str:
        return os.path.join(self.root, layer, name)

    def exists(self, layer: str, name: str) -> bool:
        return os.path.isdir(self.path(layer, name))

    def write_batch(self, df: DataFrame, layer: str, name: str, batch_id: str) -> int:
        """Idempotent overwrite of one batch partition; returns rowcount.

        The count is observed during the write job itself (F.observe:
        zero extra scans, exact number of rows that landed — the Spark
        analogue of GET DIAGNOSTICS ROW_COUNT in the procs).  An empty
        result writes no partition files under dynamic overwrite, so
        the count must NOT come from a read-back (the table dir may not
        even exist yet for a first empty batch).
        """
        from pyspark.sql import Observation

        obs = Observation()
        out = df.withColumn(BATCH_COL, F.lit(batch_id)).observe(
            obs, F.count(F.lit(1)).alias("rows")
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(self.path(layer, name))
        )
        return int(obs.get["rows"])

    def read_table(self, layer: str, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(layer, name))

    def read_batch(self, layer: str, name: str, batch_id: str) -> DataFrame:
        """Partition-pruned single-batch scan (P4, SURVEY.md §2.2)."""
        return self.read_table(layer, name).filter(F.col(BATCH_COL) == batch_id)

    def batch_is_empty(self, layer: str, name: str, batch_id: str) -> bool:
        """Empty-batch short-circuit (reference procs' COUNT(*)=0 guard,
        tools.load_crm_cust_info_v1.sql:29-40) — limit-1 scan, not a
        full count."""
        if not self.exists(layer, name):
            return True
        return self.read_batch(layer, name, batch_id).isEmpty()
