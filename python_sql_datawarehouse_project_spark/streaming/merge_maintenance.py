"""Streaming MERGE maintenance: a CDC upsert feed -> ``foreachBatch``
-> ``Warehouse.merge_upsert`` (plans/warehouse.py).

Completes the MERGE story the batch API opens, the same way
scd2_maintenance completes SCD2's and mv_maintenance the MV's: change
files arrive in a drop directory (the ordered-log stand-in —
Trigger.AvailableNow + maxFilesPerTrigger=1 feeds them in
modification-time order), and each micro-batch folds into the
batch-partitioned target as a partition-pruned upsert — matched keys
updated in their original batch, inserts landing in a per-epoch batch
``M{epoch:06d}``, delete-flagged rows removed.

Replay contract (narrower than the snapshot-per-epoch modules, stated
precisely): merge mutates the target IN PLACE, so what is idempotent
is re-running an epoch against the state it has already (fully or
partially) produced — `merge_upsert` converges because its updates
rewrite the same values, its former inserts become no-op updates and
its deletes find nothing.  That covers foreachBatch's actual
at-least-once failure mode — the restart replays only the LAST
not-yet-committed epoch, never an arbitrary historical one.  A feed
that could re-deliver OLD epochs after newer ones applied needs the
snapshot-per-epoch pattern (scd2_maintenance) or a monotonic
change-timestamp guard in the source — the ordering lesson
stream_dedup taught, applied to upserts.

Scale notes: per micro-batch cost is the batch path's — a broadcast
of the CDC delta against only the partitions holding its keys.  The
per-epoch insert batches are many-small-partitions over time;
`compact_batch` (or folding inserts into a daily batch id) is the
standing answer, same as any streaming ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.warehouse import Warehouse


class StreamingMergeMaintenance:
    """foreachBatch handler maintaining one upsert-merged table."""

    def __init__(
        self,
        wh: Warehouse,
        layer: str,
        name: str,
        key_col: str,
        delete_col: str | None = None,
    ):
        self.wh = wh
        self.layer, self.name = layer, name
        self.key_col, self.delete_col = key_col, delete_col

    def process_batch(self, df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        self.wh.merge_upsert(
            self.layer,
            self.name,
            df,
            self.key_col,
            batch_id=f"M{int(epoch_id):06d}",
            delete_col=self.delete_col,
        )

    def run_available_now(
        self, spark: SparkSession, stage: str, schema
    ) -> DataFrame:
        """Drain the staged CDC feed and return the merged table."""
        import os
        import shutil
        import tempfile
        import uuid

        ckpt = os.path.join(
            tempfile.gettempdir(),
            "spark-graft-merge-ckpt",
            uuid.uuid4().hex[:8],
        )
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
        return self.wh.read_table(self.layer, self.name)
