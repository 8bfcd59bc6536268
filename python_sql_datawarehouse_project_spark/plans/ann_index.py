"""Warehouse-backed persisted IVF index for similarity search.

The ANN twin of plans/dedup_index: sim4's oracled gate retrains its
k-means coarse quantizer and re-assigns the whole corpus on EVERY
call (a gate must be a pure function of the input tables); a
production vector store does that once.  AnnIndex persists the two
artifacts a serving path needs:

  ann_centroids   (cid, c array<double>) — KM_K trained centroids,
                  k x dim, driver-collectable by construction
  ann_lists       (vec_id, vn, cid) — the inverted lists: every
                  corpus vector normalized and assigned to its
                  nearest centroid, written PARTITIONED BY cid

and serves top-k through the exact probe the sim4 gate uses
(operators/kmeans._ivf_probe — shared code, bit-identical results,
pinned in tests/test_ann_index.py).

Why partition the lists by cid: the probe joins a BROADCAST of the
(query, probed-cid) frame against the lists, so Spark plans dynamic
partition pruning on the cid partition column — only the NPROBE
probed lists per query batch are ever read from storage.  At corpus
scale that is the difference between scanning k lists and scanning
the corpus; it is the storage-layout half of the IVF contract
(the compute half — exact cosine only inside probed lists — is the
probe itself).  The plan shape is asserted in the tests
("dynamicpruning" subquery on the lists scan).

Scale notes: centroid training is sampled at corpus scale (kmeans.py
module docstring: int64 fixed-point headroom bounds exact training at
~2M vectors/cluster; assignment of the full corpus is one broadcast
argmax pass, shuffle-free).  Rebuilds are idempotent batch overwrites
like every warehouse table; a growing corpus appends new vectors by
assigning against the FROZEN centroids (one map pass) and retrains
only when list-size skew warrants it — the standard IVF maintenance
trade, and the reason centroids and lists are separate tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kmeans import (
    _best_centroid,
    _emb_normalized,
    _ivf_probe,
    train_centroids,
)
from .warehouse import Warehouse

LAYER = "index"


class AnnIndex:
    """Persisted IVF (centroids + cid-partitioned inverted lists)."""

    def __init__(self, warehouse: Warehouse):
        self.wh = warehouse

    def _lists_path(self) -> str:
        return self.wh.path(LAYER, "ann_lists")

    def build(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        vecs: DataFrame | None = None,
    ) -> dict[str, int]:
        """Train the coarse quantizer once, assign the corpus, persist
        centroids + inverted lists; returns row counts.  `vecs` (a
        (vec_id, embedding) frame) indexes an explicit corpus — the
        role-split ingest loops (plans/emb_index.py) where the corpus
        is a subset of one embeddings table; `sf_dir` is the
        full-table convenience."""
        if vecs is not None:
            from ..operators.similarity import normalize_embeddings

            n = normalize_embeddings(vecs).persist()
        else:
            n = _emb_normalized(spark, sf_dir).persist()
        cents = train_centroids(n)
        if not cents:
            n.unpersist()
            raise ValueError("empty embeddings corpus — nothing to index")
        cent_df = spark.createDataFrame(
            [(cid, list(c)) for cid, c in enumerate(cents)],
            "cid int, c array<double>",
        )
        n_cents = self.wh.write_batch(cent_df, LAYER, "ann_centroids", "full")
        lists = n.select(
            "vec_id", "vn", _best_centroid(F.col("vn"), cents).alias("cid")
        )
        n_lists = self._write_lists(spark, lists, "full")
        n.unpersist()
        return {"ann_centroids": n_cents, "ann_lists": n_lists}

    def _write_lists(
        self, spark: SparkSession, lists: DataFrame, batch_id: str
    ) -> int:
        """Direct partitioned write (not write_batch): (batch, cid)
        partitioning — batch for idempotent dynamic overwrite of one
        ingest, cid for the probe's dynamic partition pruning.  The
        row count is observed DURING the write job (same policy as
        warehouse.write_batch): a read-back count would re-scan the
        whole lists table, turning every per-ingest append into an
        O(corpus) pass — measured as the dominant land-stage term in
        the round-10 emb ingest-loop decade bench before this fix."""
        from pyspark.sql import Observation

        obs = Observation()
        (
            lists.withColumn("batch", F.lit(batch_id))
            .observe(obs, F.count(F.lit(1)).alias("rows"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch", "cid")
            .parquet(self._lists_path())
        )
        return int(obs.get["rows"])

    def append_vectors(
        self, spark: SparkSession, new_vecs: DataFrame, batch_id: str
    ) -> int:
        """Grow the index without retraining: normalize the new
        (vec_id, embedding) frame, assign each vector to its nearest
        FROZEN centroid (one broadcast argmax map pass — no shuffle,
        no training job), land it as the batch's list partitions.
        This is the standard IVF maintenance contract: appends are
        cheap and exact w.r.t. the frozen quantizer; retrain (a new
        build) only when list-size skew warrants it.  Idempotent: a
        replay dynamically overwrites the same (batch, cid)
        partitions.  Returns the number of vectors landed."""
        from ..operators.similarity import normalize_embeddings

        cents = self.centroids(spark)
        n = normalize_embeddings(new_vecs)
        lists = n.select(
            "vec_id", "vn", _best_centroid(F.col("vn"), cents).alias("cid")
        )
        return self._write_lists(spark, lists, batch_id)

    def delete_keys(self, spark: SparkSession, keys: DataFrame) -> int:
        """Takedown path for the inverted lists (VERDICT r6 #7 — the
        corpus-curation story the DedupIndex already has): hard-delete
        vectors by vec_id, rewriting ONLY the (batch, cid) list
        partitions a deleted vector landed in.  Every vector lives in
        exactly one such partition, so the rewrite set is bounded by
        the deletion list (GDPR-class requests keep it tiny, and the
        discovery pass is a broadcast semi-join that dynamic partition
        pruning keeps off the untouched lists).  One dynamic-overwrite
        job rewrites every affected partition that still has rows;
        partitions the deletion empties are dropped explicitly
        (dynamic overwrite writes no files for an empty result, which
        would otherwise leave the deleted rows on disk — the same
        boundary plans/warehouse.delete_keys documents).  The frozen
        centroids are untouched: a takedown must not move anyone
        else's list assignment.  Replay-idempotent: deleting the same
        keys again finds zero affected partitions.  Returns the number
        of vectors removed; after it, topk == a rebuild without the
        keys (pytest-pinned)."""
        import shutil

        lists = self.lists(spark)
        affected = (
            lists.join(F.broadcast(keys), "vec_id", "left_semi")
            .select("batch", "cid")
            .distinct()
            .collect()
        )
        if not affected:
            return 0
        aff_df = spark.createDataFrame(affected)
        touched = lists.join(F.broadcast(aff_df), ["batch", "cid"], "left_semi")
        n_before = touched.count()
        # Eager checkpoint BEFORE the overwrite: the rewrite data is
        # bounded (survivors of the affected partitions only), and
        # materializing it first severs the plan's lineage to the very
        # files the write replaces.
        kept = touched.join(
            F.broadcast(keys), "vec_id", "left_anti"
        ).localCheckpoint(eager=True)
        (
            kept.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch", "cid")
            .parquet(self._lists_path())
        )
        survivors = {
            (r["batch"], r["cid"])
            for r in kept.select("batch", "cid").distinct().collect()
        }
        for r in affected:
            if (r["batch"], r["cid"]) not in survivors:
                # A takedown must fail LOUDLY if the bytes stay on
                # disk: no ignore_errors, and the hand-built path must
                # actually exist (if Spark's partition-dir encoding
                # ever diverges from this f-string — escaped values —
                # the FileNotFoundError surfaces the drift instead of
                # silently leaving the deleted vectors behind).
                shutil.rmtree(
                    os.path.join(
                        self._lists_path(),
                        f"batch={r['batch']}",
                        f"cid={r['cid']}",
                    )
                )
        # Post-delete audit: the takedown contract is "no trace of the
        # keys remains" — verify against a fresh scan, not the plan we
        # just wrote from.
        leftover = (
            self.lists(spark)
            .join(F.broadcast(keys), "vec_id", "left_semi")
            .count()
        )
        if leftover:
            raise RuntimeError(
                f"ann takedown incomplete: {leftover} deleted vec_ids "
                f"still present under {self._lists_path()}"
            )
        return n_before - kept.count()

    def centroids(self, spark: SparkSession) -> list[list[float]]:
        rows = (
            self.wh.read_table(LAYER, "ann_centroids")
            .orderBy("cid")
            .collect()
        )
        return [list(r["c"]) for r in rows]

    def lists(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._lists_path())

    def topk(self, spark: SparkSession, queries: DataFrame) -> DataFrame:
        """Top-k neighbors for a (query_id, qv) frame — qv must be
        L2-normalized, like every vector in the index.  Same probe
        code as the sim4 gate; only the NPROBE probed list partitions
        are scanned (dynamic partition pruning)."""
        return _ivf_probe(queries, self.lists(spark), self.centroids(spark))

    def topk_corpus_queries(
        self, spark: SparkSession, n_queries: int
    ) -> DataFrame:
        """The sim4 gate's query convention — the first n_queries
        corpus vectors queried against the index — served entirely
        from persisted state (no embeddings-table access)."""
        q = (
            self.lists(spark)
            .filter(F.col("vec_id") < n_queries)
            .select(F.col("vec_id").alias("query_id"), F.col("vn").alias("qv"))
        )
        return self.topk(spark, q)
