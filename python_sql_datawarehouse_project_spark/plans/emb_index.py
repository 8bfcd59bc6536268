"""Persisted embedding-side ingest index: ix2's production loop
(VERDICT r9 #3).

ix2_embedding_ingest_verdict (operators/ingest_verdict.py) is the
ORACLED composition — semantic decontamination against the eval
vectors, then a capped near-dup probe against the corpus — but a gate
must be a pure function of the input tables, so it re-normalizes and
re-bands the ENTIRE corpus on every call (the 111.9 s sf10 wall is
~entirely that corpus-side recompute).  A deployment pays the corpus
pass once.  This module is the persisted form, composing the two
index primitives that already exist:

  AnnIndex (plans/ann_index.py)   the VECTOR STORE + serving index:
      every corpus vector normalized once, IVF-assigned, persisted as
      (vec_id, vn, cid) — the rescore stage reads vn from here by
      vec_id equi-join instead of re-normalizing the corpus
  emb_eval_vn / emb_eval_bands    the eval release at rest: normalized
      eval vectors + their auto-banded hyperplane-LSH keys (the
      screen side is NEVER capped — a decontamination miss is the
      one unacceptable failure)
  emb_corpus_bands                dd16's occupancy policy at REST
      (same rule as the inline gate and DedupIndex capped mode):
      members of buckets <= AUTO_OCC, hub (min vec_id) only of
      mega-buckets, so any future probe fans in at most AUTO_OCC+1
      corpus vectors per band key
  emb_meta                        the band width (bits) FROZEN at
      build time — probes and appends must band with the builder's
      width or keys never collide; dd14's auto-sizing runs once at
      build, not per ingest

Per-ingest verdict (`ingest_verdict`) touches batch-sized data plus
index reads: normalize the batch (one map pass over BATCH vectors),
band it at the frozen width, join the persisted eval/corpus band
tables (id-only exchange), rescore candidates with the exact
sequential-fold cosine by vec_id joins against the persisted vn
tables.  Nothing recomputes corpus-side state, so per-ingest cost is
proportional to the batch + candidate fan-in (cap-bounded) —
scripts/bench_emb_ingest_loop.py measures the loop across decades,
the same protocol as the text side's bench_ingest_loop.py.

Parity: `ingest_verdict` output is pytest-pinned EQUAL to the inline
ix2 gate (tests/test_emb_index.py) when built from the same snapshot
at the same band width — same verdict rows, same canonical pointers.
Appends apply the occupancy cap per batch partition (a batch cannot
see global occupancy; periodic re-band compaction re-caps globally —
the same LSM trade DedupIndex documents).

Reference anchor: no ingest-time vector index exists in the reference
(its only index surface is relational PKs, init_tables.sql); this is
extension surface for the LLM-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators.dedup import AUTO_OCC, COSINE_T, _auto_bands, _auto_bits
from ..operators.similarity import normalize_embeddings
from .ann_index import AnnIndex
from .warehouse import BATCH_COL, Warehouse

LAYER = "index"


class EmbIngestIndex:
    """Persisted semantic-decontam + near-dup index over a growing
    vector corpus; AnnIndex is the composed vector store."""

    def __init__(self, warehouse: Warehouse, ann: AnnIndex | None = None):
        self.wh = warehouse
        self.ann = ann if ann is not None else AnnIndex(warehouse)

    # -- building --------------------------------------------------------

    def build(
        self,
        spark: SparkSession,
        corpus_vecs: DataFrame,
        eval_vecs: DataFrame,
        bits: int | None = None,
        base_id: str = "base",
    ) -> dict[str, int]:
        """One-time corpus pass: AnnIndex over the corpus (normalize +
        IVF-assign + persist), capped corpus bands at rest, the eval
        release's vectors + bands, and the frozen band width.  `bits`
        defaults to dd14's auto-sizing from the CORPUS count; pass an
        explicit width to match a co-existing inline gate (the parity
        pytest does).  Returns per-table row counts."""
        counts = self.ann.build(spark, vecs=corpus_vecs)
        n_corp = self.ann.lists(spark).select("vec_id", "vn")
        if bits is None:
            bits = _auto_bits(n_corp.count())
        counts["emb_meta"] = self.wh.write_batch(
            spark.createDataFrame([(int(bits),)], "bits int"),
            LAYER,
            "emb_meta",
            base_id,
        )
        counts["emb_corpus_bands"] = self.wh.write_batch(
            self._capped_bands(_auto_bands(n_corp, bits)),
            LAYER,
            "emb_corpus_bands",
            base_id,
        )
        n_eval = normalize_embeddings(eval_vecs).localCheckpoint(eager=True)
        counts["emb_eval_vn"] = self.wh.write_batch(
            n_eval, LAYER, "emb_eval_vn", base_id
        )
        counts["emb_eval_bands"] = self.wh.write_batch(
            _auto_bands(n_eval, bits), LAYER, "emb_eval_bands", base_id
        )
        return counts

    @staticmethod
    def _capped_bands(bands: DataFrame) -> DataFrame:
        """dd16's occupancy policy at rest: keep every member of
        band-key buckets <= AUTO_OCC, only the hub (min vec_id) of
        mega-buckets.  A future probe still pairs with the hub, so
        dup DETECTION survives; fan-in is bounded at AUTO_OCC+1 per
        key.  Identical rule to the inline ix2 gate's corp_capped."""
        occ = bands.groupBy("band_key").agg(
            F.count(F.lit(1)).alias("occ"), F.min("vec_id").alias("hub")
        )
        return (
            bands.join(occ, "band_key")
            .where(
                (F.col("occ") <= AUTO_OCC) | (F.col("vec_id") == F.col("hub"))
            )
            .select("vec_id", "band_key")
        )

    def bits(self) -> int:
        return int(
            self.wh.read_table(LAYER, "emb_meta").select("bits").first()[0]
        )

    # -- the per-ingest path ----------------------------------------------

    def ingest_verdict(
        self, spark: SparkSession, new_vecs: DataFrame, batch_id: str
    ) -> DataFrame:
        """Per new vector: (vec_id, n_eval_hits, n_corpus_dups,
        canonical_id, action) — the same verdict shape and semantics
        as the inline ix2 gate, computed from the persisted index.
        Excludes this batch_id's own landed partitions from the
        corpus side, so a replay after land_batch is idempotent.
        `new_vecs` is a (vec_id, embedding) frame; only IT is
        normalized and banded here."""
        bits = self.bits()
        n_new = normalize_embeddings(new_vecs).localCheckpoint(eager=True)
        new_bands = _auto_bands(n_new, bits).localCheckpoint(eager=True)
        not_self = F.col(BATCH_COL) != batch_id

        def rescore(cand: DataFrame, other_vn: DataFrame) -> DataFrame:
            """Exact sequential-fold cosine >= COSINE_T for candidate
            (new_id, other_id) pairs; vn re-attaches by id equi-joins
            (vectors never ride the band exchange).  The batch side —
            candidates already carrying the new vectors — is
            BROADCAST, so the persisted corpus/eval vn table streams
            through a broadcast-hash join with ZERO corpus-side
            shuffle: cap-bounded candidates x 64 doubles is a few MB
            at any corpus size, while the corpus side is the thing
            that grows."""
            a = n_new.select(
                F.col("vec_id").alias("new_id"), F.col("vn").alias("va")
            )
            b = other_vn.select(
                F.col("vec_id").alias("other_id"), F.col("vn").alias("vb")
            )
            d = H.dot_fold(F.col("va"), F.col("vb"))
            return (
                F.broadcast(cand.join(a, "new_id"))
                .join(b, "other_id")
                .filter(d >= COSINE_T)
                .select("new_id", "other_id", d.alias("cosine"))
            )

        # stage 1: semantic decontamination against the eval release
        eval_bands = self.wh.read_table(LAYER, "emb_eval_bands").select(
            F.col("vec_id").alias("other_id"), "band_key"
        )
        ecand = (
            new_bands.select(F.col("vec_id").alias("new_id"), "band_key")
            .join(eval_bands, "band_key")
            .select("new_id", "other_id")
            .dropDuplicates(["new_id", "other_id"])
        )
        eval_vn = self.wh.read_table(LAYER, "emb_eval_vn").select(
            "vec_id", "vn"
        )
        eval_hits = (
            rescore(ecand, eval_vn)
            .groupBy("new_id")
            .agg(F.count(F.lit(1)).alias("n_eval_hits"))
        )
        screened = (
            n_new.select("vec_id")
            .join(eval_hits, F.col("vec_id") == F.col("new_id"), "left")
            .select(
                "vec_id",
                F.coalesce(
                    F.col("n_eval_hits"), F.lit(0).cast("long")
                ).alias("n_eval_hits"),
            )
            .localCheckpoint(eager=True)  # feeds survivors AND the verdict
        )
        survivors = screened.where(F.col("n_eval_hits") == 0).select("vec_id")

        # stage 2: capped corpus near-dup probe for the survivors
        corp_bands = (
            self.wh.read_table(LAYER, "emb_corpus_bands")
            .filter(not_self)
            .select(F.col("vec_id").alias("other_id"), "band_key")
        )
        ccand = (
            new_bands.join(survivors, "vec_id", "left_semi")
            .select(F.col("vec_id").alias("new_id"), "band_key")
            .join(corp_bands, "band_key")
            .select("new_id", "other_id")
            .dropDuplicates(["new_id", "other_id"])
        )
        corpus_vn = self.ann.lists(spark).select("vec_id", "vn")
        dups = (
            rescore(ccand, corpus_vn)
            .groupBy("new_id")
            .agg(
                F.count(F.lit(1)).alias("n_corpus_dups"),
                F.max(
                    F.struct(
                        F.col("cosine").alias("c"),
                        (-F.col("other_id")).alias("neg_id"),
                    )
                ).alias("best"),
            )
        )

        # stage 3: keep/drop verdict + canonical pointer (argmax by
        # cosine DESC, ties to the smallest corpus vec_id)
        return (
            screened.join(dups, screened["vec_id"] == dups["new_id"], "left")
            .select(
                "vec_id",
                "n_eval_hits",
                F.coalesce(
                    F.col("n_corpus_dups"), F.lit(0).cast("long")
                ).alias("n_corpus_dups"),
                F.when(
                    F.col("n_eval_hits") == 0,
                    (-F.col("best.neg_id")).cast("long"),
                ).alias("canonical_id"),
                F.when(F.col("n_eval_hits") > 0, F.lit("drop_contaminated"))
                .when(F.col("n_corpus_dups") > 0, F.lit("drop_duplicate"))
                .otherwise(F.lit("keep"))
                .alias("action"),
            )
        )

    def delete_keys(self, spark: SparkSession, keys: DataFrame) -> dict[str, int]:
        """Takedown path (right-to-be-forgotten), completing the
        curation story the text index (DedupIndex/warehouse
        delete_keys) and AnnIndex already have: hard-delete corpus
        vectors by vec_id from BOTH halves of this index — the
        AnnIndex inverted lists (its audited delete, which rewrites
        only the (batch, cid) partitions touched and verifies no
        trace remains) and the persisted band rows (warehouse
        delete_keys, which rewrites only the batch partitions a key
        landed in).  After this, a future ingest can neither match
        nor point at the deleted vectors: no band row means no
        candidate, and the rescore's inner join against the lists
        drops any stale candidate whose vn is gone.

        Honest cap interaction: if a deleted vector was a mega-bucket
        HUB, that bucket keeps its (capped-away) members but loses
        its only at-rest representative, so probes miss dups in that
        bucket until a re-band compaction re-elects a hub — the same
        LSM-shaped trade the per-batch append cap documents.  The
        eval release is a managed dataset, not user data; it is
        deliberately untouched here.

        Returns per-table deleted-row counts; replay-idempotent
        (deleting the same keys again deletes zero rows)."""
        return {
            "ann_lists": self.ann.delete_keys(spark, keys),
            "emb_corpus_bands": self.wh.delete_keys(
                LAYER, "emb_corpus_bands", "vec_id", keys
            ),
        }

    def land_batch(
        self, spark: SparkSession, new_vecs: DataFrame, batch_id: str
    ) -> dict[str, int]:
        """Admit vectors into the corpus: assign against the frozen
        IVF centroids into the AnnIndex lists (one broadcast argmax
        map pass) and land their band keys, occupancy-capped within
        the batch partition.  Idempotent: a replay dynamically
        overwrites the same partitions.  Callers pass the KEEPERS —
        typically ingest_verdict's screen survivors (the text loop's
        convention) or its action == 'keep' rows for a
        canonical-only corpus."""
        n_landed = self.ann.append_vectors(spark, new_vecs, batch_id)
        n_new = normalize_embeddings(new_vecs)
        n_bands = self.wh.write_batch(
            self._capped_bands(_auto_bands(n_new, self.bits())),
            LAYER,
            "emb_corpus_bands",
            batch_id,
        )
        return {"ann_lists": n_landed, "emb_corpus_bands": n_bands}
