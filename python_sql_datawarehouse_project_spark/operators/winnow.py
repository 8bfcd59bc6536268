"""Winnowing document fingerprints (MOSS-style local selection) —
the position-robust span-overlap family the MinHash gates cannot
express.

  wn1_winnowing_overlap   doc pairs sharing >= MIN_SHARED winnowed
                          k-gram fingerprints (symmetric overlap)
  wn2_containment         directed containment verdict: the fraction
                          of a doc's fingerprints found in another
                          doc (the "A is substantially inside B"
                          signal Jaccard dilutes when |B| >> |A|)

Why this exists next to dd2-dd17: MinHash estimates SET Jaccard over
all shingles — it tells you two docs are globally similar, but (a) a
short doc pasted into a long one scores near zero Jaccard, and (b) a
MinHash match carries no evidence of WHERE the overlap is.  Winnowing
(Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm) selects
the minimum hash of every W consecutive k-gram hashes: any shared
token run of length >= K + W - 1 GUARANTEES a shared selected
fingerprint, so overlap counts lower-bound shared span structure, and
the directed containment ratio in wn2 catches the asymmetric
copy-into case.  This is the standard span-level decontamination /
clone-detection primitive a training-data pipeline runs beside
set-level dedup.

Determinism: gram hashes are H.md5_long (the verified 60-bit
cross-engine string hash), winnowing is int64 MIN over a fixed local
window, overlap/df counts are exact COUNT(*) — no floats anywhere
except wn2's final containment = CAST(shared AS DOUBLE) / n_fp, one
IEEE division of exact int64s (deterministic given identical
operands; pinned by the partition-invariance suite).

Scale (the reason winnowing beats storing all grams):
  * fingerprint density is bounded: winnowing selects ~2/(W+1) of
    gram positions (the SIGMOD'03 density bound), and at most one
    fingerprint per window — the per-doc fingerprint set is a
    fraction of the token count BEFORE any distinct;
  * everything up to the fingerprint explode is per-row array
    expressions inside whole-stage codegen — token split, gram
    hashing, window minima — zero shuffle, zero UDF, scan-speed;
  * the pair stage joins on the fingerprint value with a document-
    frequency band [2, DF_CAP]: df = 1 cannot produce a pair, and
    df > DF_CAP marks boilerplate (stop-fingerprints), so per-key
    join fan-out is bounded by DF_CAP — the same occupancy-cap
    argument as dd16/dd17, no hot-key quadratic blowup;
  * both join inputs share the fingerprint hash partitioning, so AQE
    reuses one Exchange per side; output is pair-grain, orders of
    magnitude smaller than fingerprint grain.

Reference anchor: the reference has no fingerprinting surface; this
extends the dedup/decontamination family (BASELINE.json north star)
beside tx4's Karp-Rabin per-doc fingerprint and tx6's exact-gram
decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import hashing as H
from .text import _sql_tokens, _tokens

# k-gram size in tokens; a shared literal run of K + WINNOW_W - 1 = 8
# tokens guarantees a shared fingerprint (the winnowing guarantee
# threshold t = K + W - 1).
K_GRAM = 5
WINNOW_W = 4
# Document-frequency band for the pair join: df=1 can't pair; df >
# DF_CAP is boilerplate (stop-fingerprint), dropped like dd16/dd17
# drop over-occupied LSH buckets.
DF_CAP = 50
# wn1 reports pairs sharing at least this many fingerprints.
MIN_SHARED = 2
# wn2 reports directed containment at or above this ratio.
CONTAIN_MIN = 0.5


def fingerprints_of(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): distinct winnowed fingerprints per document.

    Entirely per-row until the final explode: tokens -> positional
    k-gram md5_long hashes (one array) -> per-window minima ->
    array_distinct.  Docs shorter than K_GRAM tokens produce no
    grams; gram arrays shorter than WINNOW_W produce no windows —
    both filtered BEFORE F.sequence so Spark's inclusive sequence()
    never sees a descending (1, 0) range (DuckDB's range() is
    end-exclusive; the WHERE guards keep the two engines aligned).
    """
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("tk")).where(
        F.size("tk") >= K_GRAM
    )
    grams = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - K_GRAM + 1),
            lambda p: H.md5_long(F.array_join(F.slice("tk", p, K_GRAM), " ")),
        ).alias("hs"),
    ).where(F.size("hs") >= WINNOW_W)
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - WINNOW_W + 1),
            lambda p: F.array_min(F.slice("hs", p, WINNOW_W)),
        )
    )
    return grams.select("doc_id", F.explode(fps).alias("fp"))


def _fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints_of(load_table(spark, sf_dir, "documents"))


def _live(fp: DataFrame) -> DataFrame:
    """Fingerprints inside the df band [2, DF_CAP] — the pairable,
    non-boilerplate set.  One map-side-combinable count + one
    equi-join that reuses the count's fp partitioning."""
    df = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("dfreq"))
    band = df.where((F.col("dfreq") >= 2) & (F.col("dfreq") <= DF_CAP))
    return fp.join(band.select("fp"), "fp")


def wn1_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric span-overlap pairs: (doc_a < doc_b, n_shared)."""
    live = _live(_fingerprints(spark, sf_dir))
    a = live.alias("a")
    b = live.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= MIN_SHARED)
    )


def wn2_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment: for each ordered (src, dst) pair, the
    fraction of src's banded fingerprints also present in dst.
    Emitted where containment >= CONTAIN_MIN — both directions can
    appear, and a short doc pasted into a long one scores ~1.0 here
    while its symmetric Jaccard stays near zero."""
    live = _live(_fingerprints(spark, sf_dir))
    nlive = live.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = live.alias("a")
    b = live.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("src_doc"),
            F.col("b.doc_id").alias("dst_doc"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    contained = (
        shared.join(nlive, shared.src_doc == nlive.doc_id)
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
    return contained


def _sql_substrate() -> str:
    """Shared oracle CTE chain (toks -> grams -> winnowed -> fp ->
    live), emitted from the SAME constants as the Spark side."""
    return f"""
toks AS (
    SELECT doc_id, {_sql_tokens('text')} AS tk FROM documents
),
grams AS (
    SELECT doc_id,
           list_transform(range(1, len(tk) - {K_GRAM} + 2),
               p -> {H.sql_md5_long(
                   f"array_to_string(list_slice(tk, p, p + {K_GRAM} - 1), ' ')"
               )}) AS hs
    FROM toks WHERE len(tk) >= {K_GRAM}
),
winnowed AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(hs) - {WINNOW_W} + 2),
               p -> list_min(list_slice(hs, p, p + {WINNOW_W} - 1)))) AS fps
    FROM grams WHERE len(hs) >= {WINNOW_W}
),
fp AS (
    SELECT doc_id, unnest(fps) AS fp FROM winnowed
),
dfreqs AS (
    SELECT fp, count(*) AS dfreq FROM fp GROUP BY fp
),
live AS (
    SELECT f.doc_id, f.fp
    FROM fp f JOIN dfreqs USING (fp)
    WHERE dfreq BETWEEN 2 AND {DF_CAP}
)"""


WN1_ORACLE = f"""
WITH {_sql_substrate()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM live a JOIN live b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {MIN_SHARED}
"""


WN2_ORACLE = f"""
WITH {_sql_substrate()},
nlive AS (
    SELECT doc_id, count(*) AS n_fp FROM live GROUP BY doc_id
),
shared AS (
    SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc, count(*) AS n_shared
    FROM live a JOIN live b ON a.fp = b.fp AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
)
SELECT s.src_doc, s.dst_doc, n.n_fp, s.n_shared,
       CAST(s.n_shared AS DOUBLE) / n.n_fp AS containment
FROM shared s JOIN nlive n ON n.doc_id = s.src_doc
WHERE CAST(s.n_shared AS DOUBLE) / n.n_fp >= {CONTAIN_MIN}
"""


QUERIES = {
    "wn1_winnowing_overlap": wn1_winnowing_overlap,
    "wn2_containment": wn2_containment,
}
ORACLES = {
    "wn1_winnowing_overlap": WN1_ORACLE,
    "wn2_containment": WN2_ORACLE,
}
