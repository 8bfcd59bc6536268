"""Winnowing document fingerprints (MOSS-style local selection) —
the position-robust span-overlap family the MinHash gates cannot
express.

  wn1_winnowing_overlap      doc pairs sharing >= MIN_SHARED winnowed
                             k-gram fingerprints (symmetric overlap)
  wn2_containment            directed containment verdict: the
                             fraction of a doc's fingerprints found
                             in another doc (the "A is substantially
                             inside B" signal Jaccard dilutes when
                             |B| >> |A|)
  wn3_span_decontamination   per-corpus-doc verdict: benchmark items
                             whose fingerprint mass appears inside
                             the doc (the span rung of the tx6 ->
                             qa23 -> tx20 decontamination ladder)

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
  * the substrate is TOKEN-GRAIN codegen (posexplode -> one md5 per
    token -> window-LEAD Horner gram rolls -> ROWS-frame MIN): one
    exchange on doc_id + one per-doc sort, compact int64 shuffle
    rows, no UDF and no interpreted lambdas (see fingerprints_of's
    docstring for the measured 236 s -> 2 s lesson);
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

# Gram hashing: one md5_long per TOKEN (reduced mod the Mersenne
# prime), then each k-gram combines its K token hashes with TWO
# Horner rolls (multipliers A1/A2 mod P) concatenated into a 62-bit
# value h1 * P + h2 — 5x fewer digests than hashing every gram
# string, and no per-gram string building.  Exactness: every step is
# int64 arithmetic below 2^62 (acc < P, acc * A2 < 2^61), identical
# on both engines; collision space 2^62 like a direct md5 prefix.
GRAM_A1 = 1_000_003
GRAM_A2 = 999_999_937


def fingerprints_of(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): distinct winnowed fingerprints per document.

    TOKEN-GRAIN formulation: posexplode tokens, hash each token ONCE
    as a top-level codegen'd column, roll k-gram hashes with window
    LEADs, winnow with a MIN over the ROWS frame, distinct.  The
    first cut did all of this inside array-lambda expressions
    (F.transform) and measured ~50 microseconds PER ELEMENT: Spark
    evaluates higher-order-function lambdas interpreted (no
    whole-stage codegen inside the lambda), and CollapseProject
    re-inlines a referenced intermediate array into every consumer,
    multiplying the md5 work by the reference count.  Moving the
    hash to token grain puts md5/conv back inside codegen
    (sub-microsecond) and the window pass is one exchange on doc_id
    + one per-doc sort — the standard distributed text shape (dd2 /
    tx-family), linear at any corpus size with compact (doc_id,
    pos, int64) shuffle rows.  Measured: 236 s -> ~2 s for the
    sf0.1 substrate.

    Alignment with the DuckDB oracle's list formulation: gram p
    exists iff lead(K-1) is non-null (propagated nulls drop the
    tail positions), and winnow keeps pos <= max_pos - (W-1) so
    every MIN frame holds exactly W grams — identical to the
    oracle's range(1, len - W + 2) slice windows.
    """
    from pyspark.sql import Window

    toks = docs.select("doc_id", _tokens(F.col("text")).alias("tk")).where(
        F.size("tk") >= K_GRAM
    )
    tok = toks.select("doc_id", F.posexplode("tk").alias("pos", "t"))
    th = tok.select(
        "doc_id", "pos", (H.md5_long(F.col("t")) % H.MINHASH_P).alias("th")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    h1 = F.col("th")
    h2 = F.col("th")
    for i in range(1, K_GRAM):
        t = F.lead("th", i).over(w)
        h1 = (h1 * GRAM_A1 + t) % H.MINHASH_P
        h2 = (h2 * GRAM_A2 + t) % H.MINHASH_P
    grams = th.select(
        "doc_id", "pos", (h1 * H.MINHASH_P + h2).alias("gh")
    ).where(F.col("gh").isNotNull())
    wmin = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    wdoc = Window.partitionBy("doc_id")
    winnowed = grams.select(
        "doc_id",
        "pos",
        F.min("gh").over(wmin).alias("fp"),
        F.max("pos").over(wdoc).alias("maxp"),
    ).where(F.col("pos") <= F.col("maxp") - (WINNOW_W - 1))
    return winnowed.select("doc_id", "fp").distinct()


def _fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-path substrate: localCheckpoint the fingerprint set so
    the df count, band join and pair self-join reuse it instead of
    re-running tokenize+hash+window up to four times (the tx9
    pattern).  Parallelism comes from the window exchange on doc_id
    — no explicit repartition needed."""
    return fingerprints_of(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)


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
    h1 = "th[p]"
    h2 = "th[p]"
    for i in range(1, K_GRAM):
        h1 = f"(({h1}) * {GRAM_A1} + th[p + {i}]) % {H.MINHASH_P}"
        h2 = f"(({h2}) * {GRAM_A2} + th[p + {i}]) % {H.MINHASH_P}"
    return f"""
toks AS (
    SELECT doc_id, {_sql_tokens('text')} AS tk FROM documents
),
th AS (
    SELECT doc_id,
           list_transform(tk, t -> {H.sql_md5_long('t')} % {H.MINHASH_P})
               AS th
    FROM toks WHERE len(tk) >= {K_GRAM}
),
grams AS (
    SELECT doc_id,
           list_transform(range(1, len(th) - {K_GRAM} + 2),
               p -> ({h1}) * {H.MINHASH_P} + ({h2})) AS hs
    FROM th
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


# -- wn3: span-level benchmark decontamination ------------------------
# Completes the decontamination ladder (tx6 exact 8-grams -> qa23
# Bloom screen -> tx20 MinHash fuzzy): a corpus document is flagged
# when a substantial FRACTION of some benchmark document's winnowed
# fingerprints appear inside it — the paraphrase-robust, position-
# robust span test.  tx6 catches verbatim 8-grams; tx20 catches
# whole-document paraphrases; wn3 catches a benchmark ITEM pasted
# into an otherwise-unrelated document, which is the common real
# leak shape (few verbatim grams after light editing, near-zero
# whole-doc Jaccard).  Role convention: doc_id % WN3_BENCH_MOD == 0
# is the benchmark suite (a 10% eval share — tx6's 1% BENCH_MOD
# leaves the span-leak population empty at sf0.01, which would make
# the gate trivially green; the modulus is a test-harness role
# choice, not an algorithm parameter).
WN3_BENCH_MOD = 10


def wn3_span_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-corpus-doc verdict: (doc_id, n_bench_hits,
    max_containment, contaminated) — a hit is a benchmark doc whose
    banded fingerprints are contained in the corpus doc at >=
    CONTAIN_MIN.  Direction matters: the BENCHMARK doc is the src
    (its fingerprint count is the denominator), so a short eval item
    inside a long document still scores ~1.0.

    Scale: the benchmark side is eval-suite-sized (bounded), so its
    live fingerprint set broadcasts; the corpus side pays one
    substrate pass + an id-grain aggregation — per-corpus-row cost
    is flat, the tx6/qa23 shape with span semantics."""
    fp = _fingerprints(spark, sf_dir)
    is_bench = F.col("doc_id") % WN3_BENCH_MOD == 0
    live = _live(fp)
    bench = live.where(is_bench)
    corpus = live.where(~is_bench)
    n_bfp = bench.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    shared = (
        bench.alias("b")
        .join(corpus.alias("c"), F.col("b.fp") == F.col("c.fp"))
        .groupBy(
            F.col("b.doc_id").alias("bench_doc"),
            F.col("c.doc_id").alias("doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    scored = shared.join(
        n_bfp.withColumnRenamed("doc_id", "bench_doc"), "bench_doc"
    ).select(
        "doc_id",
        (F.col("n_shared").cast("double") / F.col("n_fp")).alias("cont"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("cont") >= CONTAIN_MIN, 1).otherwise(0)
            ).cast("long").alias("n_bench_hits"),
            F.max("cont").alias("max_containment"),
        )
        .where(F.col("n_bench_hits") >= 1)
        .withColumn("contaminated", F.lit(1))
    )


def _wn3_oracle() -> str:
    return f"""
WITH {_sql_substrate()},
bench AS (SELECT * FROM live WHERE doc_id % {WN3_BENCH_MOD} = 0),
corpus AS (SELECT * FROM live WHERE doc_id % {WN3_BENCH_MOD} <> 0),
n_bfp AS (SELECT doc_id, count(*) AS n_fp FROM bench GROUP BY doc_id),
shared AS (
    SELECT b.doc_id AS bench_doc, c.doc_id AS doc_id,
           count(*) AS n_shared
    FROM bench b JOIN corpus c ON b.fp = c.fp
    GROUP BY 1, 2
),
scored AS (
    SELECT s.doc_id,
           CAST(s.n_shared AS DOUBLE) / n.n_fp AS cont
    FROM shared s JOIN n_bfp n ON n.doc_id = s.bench_doc
)
SELECT doc_id,
       CAST(sum(CASE WHEN cont >= {CONTAIN_MIN} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bench_hits,
       max(cont) AS max_containment,
       CAST(1 AS INTEGER) AS contaminated
FROM scored
GROUP BY doc_id
HAVING sum(CASE WHEN cont >= {CONTAIN_MIN} THEN 1 ELSE 0 END) >= 1
"""


WN3_ORACLE = _wn3_oracle()

QUERIES = {
    "wn1_winnowing_overlap": wn1_winnowing_overlap,
    "wn2_containment": wn2_containment,
    "wn3_span_decontamination": wn3_span_decontamination,
}
ORACLES = {
    "wn1_winnowing_overlap": WN1_ORACLE,
    "wn2_containment": WN2_ORACLE,
    "wn3_span_decontamination": WN3_ORACLE,
}
