"""Warehouse-backed persisted winnowing-fingerprint index — the
production seam of the wn1/wn2 span-overlap family (operators/
winnow.py), built the way DedupIndex persists the MinHash family:
fingerprint the corpus ONCE, land id-grain index tables, and give
every arriving batch a containment probe whose cost scales with the
batch, never the corpus.

Index tables (layer ``index``, partitioned by dwh_batch_id):

  wfp   (doc_id, fp) — each document's distinct winnowed k-gram
        fingerprints (~2/(W+1) of token count, the SIGMOD'03 density
        bound); the per-doc state a containment probe joins against
  wdf   (fp, cnt) — PER-BATCH partial document-frequency counts.
        Counts are mergeable by SUM, so global df for any
        fingerprint is an aggregation over partitions — the same
        partial-aggregate contract as the incremental MV state

The probe (``probe``) is wn2's directed containment restricted to
batch -> corpus, index-fed:

  1. fingerprint ONLY the batch (per-row codegen, no shuffle);
  2. resolve the df band [2, DF_CAP] for the batch's fingerprints:
     batch-local df + the persisted partials, corpus side pre-
     filtered by a broadcast of the batch's fingerprint set (the
     corpus-scale table is scanned with a broadcast hash filter —
     no corpus shuffle, and Catalyst's runtime bloom filter prunes
     the scan the same way ix1's band probe is pruned);
  3. join the corpus wfp rows on the banded fingerprints and score
     containment = shared / |live batch fps|.

Parity: the probe is pytest-pinned EQUAL to the inline twin
(``winnow_contain_probe`` — the same composition over explicit
corpus/batch frames) including the df band arithmetic: total df =
batch df + corpus df matches what wn2 computes over the union
corpus, so index-fed and from-scratch agree bit-for-bit
(tests/test_winnow_index.py, including after an append).

At 100 TB: fingerprinting is one pass per document EVER; the wfp
table is a fraction of corpus token count; per-ingest probe cost is
batch fingerprints + one broadcast-filtered scan + one id-grain
join — the ix1/EmbIngestIndex flat-per-ingest shape applied to the
span-overlap modality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.winnow import CONTAIN_MIN, DF_CAP, fingerprints_of
from .warehouse import Warehouse

LAYER = "index"


def winnow_contain_probe(
    batch_docs: DataFrame, corpus_docs: DataFrame
) -> DataFrame:
    """Inline twin: wn2's directed containment for batch docs against
    a corpus, with the df band computed over the UNION (what wn2 sees
    when the roles live in one table).  (src_doc, dst_doc, n_fp,
    n_shared, containment >= CONTAIN_MIN)."""
    bfp = fingerprints_of(batch_docs)
    cfp = fingerprints_of(corpus_docs)
    df_total = (
        bfp.select("fp")
        .union(cfp.select("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dfreq"))
        .where((F.col("dfreq") >= 2) & (F.col("dfreq") <= DF_CAP))
        .select("fp")
    )
    live_b = bfp.join(df_total, "fp")
    live_c = cfp.join(df_total, "fp")
    return _score(live_b, live_c)


def _score(live_b: DataFrame, live_c: DataFrame) -> DataFrame:
    n_fp = live_b.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    shared = (
        live_b.alias("a")
        .join(live_c.alias("b"), "fp")
        .groupBy(
            F.col("a.doc_id").alias("src_doc"),
            F.col("b.doc_id").alias("dst_doc"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(n_fp, shared.src_doc == n_fp.doc_id)
        .select(
            "src_doc",
            "dst_doc",
            "n_fp",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_fp")).alias(
                "containment"
            ),
        )
        .where(F.col("containment") >= CONTAIN_MIN)
    )


class WinnowIndex:
    def __init__(self, warehouse: Warehouse, batch_id: str = "full"):
        self.wh = warehouse
        self.batch_id = batch_id

    # -- building ------------------------------------------------------
    def build_docs(self, spark: SparkSession, docs: DataFrame) -> dict:
        """Base snapshot: fingerprint the corpus once, land wfp + the
        df partials under the base batch id."""
        return self._land(docs, self.batch_id)

    def append_batch(
        self, spark: SparkSession, docs: DataFrame, bid: str
    ) -> dict:
        """Land an accepted batch's fingerprints as a new partition —
        batch-only cost; the df partials stay mergeable by SUM."""
        return self._land(docs, bid)

    def _land(self, docs: DataFrame, bid: str) -> dict:
        fp = fingerprints_of(docs).localCheckpoint(eager=True)
        n_fp = self.wh.write_batch(fp, LAYER, "wfp", bid)
        n_df = self.wh.write_batch(
            fp.groupBy("fp").agg(F.count(F.lit(1)).alias("cnt")),
            LAYER,
            "wdf",
            bid,
        )
        return {"wfp": n_fp, "wdf": n_df}

    # -- probing -------------------------------------------------------
    def probe(self, spark: SparkSession, batch_docs: DataFrame) -> DataFrame:
        """Index-fed containment verdict for an arriving batch: equal
        to winnow_contain_probe(batch, corpus-at-rest) bit-for-bit,
        touching the corpus only through broadcast-filtered scans of
        the persisted tables."""
        bfp = fingerprints_of(batch_docs).localCheckpoint(eager=True)
        probe_fps = bfp.select("fp").distinct()
        df_batch = bfp.groupBy("fp").agg(F.count(F.lit(1)).alias("b_cnt"))
        df_corpus = (
            self.wh.read_table(LAYER, "wdf")
            .join(F.broadcast(probe_fps), "fp")
            .groupBy("fp")
            .agg(F.sum("cnt").alias("c_cnt"))
        )
        band = (
            df_batch.join(df_corpus, "fp", "left")
            .select(
                "fp",
                (
                    F.col("b_cnt")
                    + F.coalesce(F.col("c_cnt"), F.lit(0).cast("long"))
                ).alias("dfreq"),
            )
            .where((F.col("dfreq") >= 2) & (F.col("dfreq") <= DF_CAP))
            .select("fp")
        )
        live_b = bfp.join(band, "fp")
        live_c = (
            self.wh.read_table(LAYER, "wfp")
            .join(F.broadcast(band), "fp")
            .select("doc_id", "fp")
        )
        return _score(live_b, live_c)
