"""Incremental (new-batch-vs-corpus) near-duplicate probe — the
continuous-ingestion shape of dedup (BASELINE.json extension; the
reference's incremental surface is its batch-id bronze loads,
SURVEY.md §2.1 S8, which replace rather than probe).

  dd11_incremental_lsh   for every NEW document, its near-duplicate
                         matches in the EXISTING corpus: banded
                         MinHash-LSH candidates (new x old only),
                         then exact Jaccard verify

Why a separate operator when dd2 exists: a growing corpus must not
re-pair itself on every ingest.  dd2's self-join is O(pairs(corpus))
per run; the incremental probe joins only the new batch's band keys
against the corpus bands, so per-ingest cost scales with the BATCH
(times band-collision fan-in), not with the corpus.  At 100 TB the
corpus side's sketches/bands are a persisted artifact (the "LSH
index" — written once by the initial dd2-style pass, appended per
batch); this operator recomputes them inline only because the gate
must be a pure function of the input tables.  The persisted form is
IMPLEMENTED at plans/dedup_index.DedupIndex since round 6:
append_batch runs exactly this asymmetric probe against the
warehouse-backed band index (bucketed variant eliminates the
corpus-side shuffle, plan-pinned), with pytest proving appended
state == from-scratch rebuild.  Batch-internal duplicates are dd2
applied to the batch alone — same machinery, batch-sized cost.

Batch membership is a deterministic md5 gate (pmod(h(doc_id), 5) == 0
-> ~20% "new"), not a doc_id cutoff: identical membership across
engines, re-runs and scale factors, the same device ds1 uses.

Scale notes: the band join exchanges only (doc_id, band, band_key);
hs payloads re-attach by doc_id-keyed hash joins afterwards (the
dd3 lesson — never shuffle sketches through the band exchange).  The
corpus side of the band join is the big side; Spark plans a plain
hash/SMJ shuffle on (band, band_key), which is exactly the persisted
index's layout on a cluster, so the shuffle disappears entirely when
the index is bucketed by band_key (plans/bucketing.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import hashing as H
from .dedup import (
    JACCARD_T,
    _doc_sketches,
    _sql_band_ctes,
)

NEW_MOD = 5  # pmod(md5_long(doc_id), NEW_MOD) == 0 -> "new batch"


def _is_new(doc_id_col) -> F.Column:
    return F.pmod(H.md5_long(doc_id_col.cast("string")), F.lit(NEW_MOD)) == 0


def _bands(sk: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) — same banding as dedup._lsh_candidates."""
    return sk.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(H.LSH_BANDS - 1))).alias("band"),
        "sig",
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.col("sig"), F.col("band") * H.LSH_ROWS + 1, H.LSH_ROWS
                    ),
                    lambda s: s.cast("string"),
                ),
            )
        ).alias("band_key"),
    )


def dd11_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sk = _doc_sketches(docs).localCheckpoint(eager=True)
    new_sk = sk.filter(_is_new(F.col("doc_id")))
    old_sk = sk.filter(~_is_new(F.col("doc_id")))

    cand = (
        _bands(new_sk)
        .select(F.col("doc_id").alias("new_doc_id"), "band", "band_key")
        .join(
            _bands(old_sk).select(
                F.col("doc_id").alias("corpus_doc_id"), "band", "band_key"
            ),
            ["band", "band_key"],
        )
        .select("new_doc_id", "corpus_doc_id")
        .dropDuplicates(["new_doc_id", "corpus_doc_id"])
    )
    pairs = cand.join(
        new_sk.select(F.col("doc_id").alias("new_doc_id"), F.col("hs").alias("hs_a")),
        "new_doc_id",
    ).join(
        old_sk.select(
            F.col("doc_id").alias("corpus_doc_id"), F.col("hs").alias("hs_b")
        ),
        "corpus_doc_id",
    )
    sized = pairs.select(
        "new_doc_id",
        "corpus_doc_id",
        F.size(F.array_intersect("hs_a", "hs_b")).alias("ni"),
        F.size("hs_a").alias("na"),
        F.size("hs_b").alias("nb"),
    )
    jac = F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))
    return (
        sized.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("new_doc_id", "corpus_doc_id", "jaccard")
    )


_SQL_IS_NEW = (
    f"mod({H.sql_md5_long('CAST(doc_id AS VARCHAR)')}, {NEW_MOD}) = 0"
)

DD11_ORACLE = f"""
WITH {_sql_band_ctes()},
tagged AS (
    SELECT b.*, ({_SQL_IS_NEW.replace('doc_id', 'b.doc_id')}) AS is_new
    FROM bands b
),
cand AS (
    SELECT DISTINCT n.doc_id AS new_doc_id, o.doc_id AS corpus_doc_id,
           n.hs AS hs_a, o.hs AS hs_b
    FROM tagged n JOIN tagged o
      ON n.band = o.band AND n.band_key = o.band_key
     AND n.is_new AND NOT o.is_new
)
SELECT new_doc_id, corpus_doc_id,
       CAST(len(list_intersect(hs_a, hs_b)) AS DOUBLE)
         / (len(hs_a) + len(hs_b) - len(list_intersect(hs_a, hs_b)))
           AS jaccard
FROM cand
WHERE CAST(len(list_intersect(hs_a, hs_b)) AS DOUBLE)
         / (len(hs_a) + len(hs_b) - len(list_intersect(hs_a, hs_b)))
       >= {JACCARD_T}
"""


QUERIES = {"dd11_incremental_lsh": dd11_incremental_lsh}
ORACLES = {"dd11_incremental_lsh": DD11_ORACLE}
