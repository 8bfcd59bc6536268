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

    # -- storage maintenance (beyond-reference warehouse operations) --

    def read_table_evolved(self, layer: str, name: str) -> DataFrame:
        """Schema-evolution read: batches written before a column was
        added still scan cleanly, with NULLs where the column did not
        exist (parquet mergeSchema — the footer union, computed once
        at planning time).  The per-batch write path needs no change:
        schema evolution in a batch-partitioned layout is purely a
        read-side union of footers, which is why the warehouse can add
        columns without rewriting history."""
        return (
            self.spark.read.option("mergeSchema", "true")
            .parquet(self.path(layer, name))
        )

    def compact_batch(
        self, layer: str, name: str, batch_id: str, target_files: int
    ) -> int:
        """Small-files compaction for one batch partition: rewrite it
        at a bounded file count and return the new count.

        Streaming/micro-batch ingestion leaves many tiny files per
        partition; at 100 TB the scan-planning and footer costs of
        millions of small files dominate before a byte is read.
        Compaction is the same idempotent dynamic-overwrite as
        write_batch (a replay rewrites the same partition), restricted
        to one partition so running it online races nothing outside
        that batch.  The rewrite preserves rows exactly — asserted in
        tests — because it is a coalesce of the pruned scan, not a
        recompute."""
        part = self.read_batch(layer, name, batch_id).drop(BATCH_COL)
        self.write_batch(
            part.coalesce(target_files), layer, name, batch_id
        )
        part_dir = os.path.join(
            self.path(layer, name), f"{BATCH_COL}={batch_id}"
        )
        return len(
            [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        )

    def delete_keys(
        self, layer: str, name: str, key_col: str, keys: DataFrame
    ) -> int:
        """Hard-delete rows by key (right-to-be-forgotten): rewrite
        ONLY the batch partitions that contain the keys, anti-joining
        the keys out; untouched partitions keep their files byte-
        identical.  Returns the number of rows deleted.

        The affected-partition discovery is a pruned aggregate over
        the key semi-join (at scale: a broadcast of the deletion list,
        which GDPR-class requests keep tiny), so a 100 TB table
        rewrites only the partitions a deleted key ever landed in —
        with dd7-style id lists this is the deletion path a training
        corpus needs when a takedown arrives."""
        table = self.read_table(layer, name)
        affected = [
            r[0]
            for r in table.join(F.broadcast(keys), key_col, "left_semi")
            .select(BATCH_COL)
            .distinct()
            .collect()
        ]
        deleted = 0
        for b in affected:
            part = self.read_batch(layer, name, b).drop(BATCH_COL)
            kept = part.join(F.broadcast(keys), key_col, "left_anti")
            n_before = part.count()
            n_after = self.write_batch(kept, layer, name, b)
            if n_after == 0:
                # dynamic overwrite writes NO files for an empty
                # result, which would leave the old partition (and the
                # supposedly-deleted rows) on disk — drop it explicitly
                import shutil

                shutil.rmtree(
                    os.path.join(
                        self.path(layer, name), f"{BATCH_COL}={b}"
                    ),
                    ignore_errors=True,
                )
            deleted += n_before - n_after
        return deleted
