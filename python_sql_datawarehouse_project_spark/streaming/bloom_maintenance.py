"""Streaming Bloom-index maintenance: readStream -> foreachBatch ->
BloomIndex.append_batch per arriving benchmark release.

plans/bloom_index.py keeps the decontamination sketch as OR-merged
release partitions; this module is the Structured-Streaming driver
for the same contract, completing the maintenance family
(mv_maintenance / scd2_maintenance / merge_maintenance): benchmark
releases ARRIVE as staged document files tagged with their release
id, and every micro-batch folds each release into the index through
the idempotent partition write.

Exactly-once output from at-least-once delivery, the family's
standard argument: a replayed epoch re-blooms the same release rows
into the SAME dwh_batch_id partition (dynamic overwrite), and the
merged view is a pure fold over the partition listing — so replay
changes nothing.  AvailableNow may coalesce several staged releases
into one epoch; each id is folded separately so a release is never
split or blended across partitions.

Scale notes: per-micro-batch work is one gram-hash pass over the
ARRIVING release plus a <= BLOOM_BITS/32-row aggregation — cost
scales with the release, never the index or the corpus.  No state
store at all: the sketch state lives in the warehouse where it is
restart-safe, inspectable, and shared with the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import _doc_grams
from ..plans.bloom_index import BloomIndex
from ..plans.warehouse import BATCH_COL


class StreamingBloomMaintenance:
    """foreachBatch handler folding benchmark releases into a
    persisted BloomIndex."""

    def __init__(self, idx: BloomIndex):
        self.idx = idx

    def process_batch(self, df: DataFrame, epoch_id: int) -> None:
        """One micro-batch of benchmark documents (doc_id, text,
        dwh_batch_id = release id); folds each release id separately,
        in id order."""
        spark = df.sparkSession
        ids = [r[0] for r in df.select(BATCH_COL).distinct().collect()]
        for bid in sorted(ids):
            docs = df.filter(F.col(BATCH_COL) == bid).drop(BATCH_COL)
            self.idx.append_batch(
                spark, _doc_grams(docs).select("h").distinct(), bid
            )

    def run_available_now(
        self,
        spark: SparkSession,
        staging_dir: str,
        checkpoint_dir: str,
        schema: str,
    ) -> None:
        """Drain all staged release files (Trigger.AvailableNow, the
        family's batch-drain mode; a production deployment swaps the
        trigger, nothing else changes)."""
        q = (
            spark.readStream.schema(schema)
            .parquet(staging_dir)
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
