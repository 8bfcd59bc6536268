"""Evaluation scoreboards over the engine's own approximate/heuristic
operators — the "measure your pipeline's components" family that
turns qa15's recall-audit idea into a pattern (BASELINE.json
extension; no reference counterpart).

  tx14_langid_confusion   confusion matrix of tx3's language-ID
                          heuristic against the labeled lang column —
                          the per-class view that reveals WHICH
                          cohorts a heuristic router misroutes
  sim6_ivf_recall         per-query recall@k of the IVF index (sim3)
                          against the exact top-k (sim1) — the
                          standard ANN quality metric, computed from
                          two already-deterministic result sets
  qa18_blocking_recall    recall of dd9's length-bucket blocking vs
                          exact all-pairs prefix edit distance on a
                          bounded sample (measures the trade dd9's
                          docstring documents: 4/6 = 0.67 at test SF)

Both are pure compositions of existing gates' outputs (every input
double is bitwise cross-engine already), so the scoreboards
themselves hash-match trivially — the value is that index/heuristic
regressions now FAIL a correctness gate instead of silently shipping.

Scale: tx14 aggregates the per-doc prediction stream to a
langs x langs matrix (map-side combinable).  sim6 joins two
(n_queries x k)-row sets — probe-set-sized, independent of corpus
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import SIM1_ORACLE, SIM3_ORACLE, TOP_K
from .similarity import sim1_topk_bruteforce, sim3_ivf_topk
from .text import TX3_ORACLE, tx3_language_id


def tx14_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(labeled, predicted) counts plus the share of the labeled
    cohort — recall per class sits on the diagonal.

    Single corpus pass: the per-label total is the SUM of the
    confusion cell counts, taken as a window over the (|langs|^2)-row
    aggregate — referencing the prediction frame twice would run
    tx3's stopword-filter expression tree twice over the corpus
    (Catalyst does not dedupe common subplans; with tx3's
    tokenize-once projection this lands at 1.0 s at sf0.1, from
    3.3 s)."""
    from pyspark.sql import Window

    preds = tx3_language_id(spark, sf_dir).select(
        "labeled_lang", "predicted_lang"
    )
    counts = preds.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("labeled_lang")
    return counts.select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("share_of_label"),
    )


TX14_ORACLE = f"""
WITH preds AS (SELECT * FROM ({TX3_ORACLE}) t),
counts AS (
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
    FROM preds GROUP BY 1, 2
)
SELECT labeled_lang, predicted_lang, n_docs,
       CAST(n_docs AS DOUBLE)
           / CAST(SUM(n_docs) OVER (PARTITION BY labeled_lang) AS DOUBLE)
           AS share_of_label
FROM counts
"""


def sim6_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k per probe query: |IVF top-k ∩ exact top-k| / k."""
    exact = sim1_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ivf = sim3_ivf_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    return (
        exact.join(
            ivf,
            (exact.query_id == ivf.query_id)
            & (F.col("neighbor_id") == F.col("ivf_neighbor")),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(F.count("ivf_neighbor").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(float(TOP_K))).alias(
                "recall_at_k"
            ),
        )
    )


SIM6_ORACLE = f"""
WITH exact AS (SELECT query_id, neighbor_id FROM ({SIM1_ORACLE}) s),
ivf AS (SELECT query_id, neighbor_id FROM ({SIM3_ORACLE}) s)
SELECT e.query_id,
       CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(i.neighbor_id) AS DOUBLE) / {float(TOP_K)!r}
           AS recall_at_k
FROM exact e LEFT JOIN ivf i
  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
GROUP BY 1
"""


# -- qa18: blocking recall audit for fuzzy ER -------------------------
QA18_SAMPLE = 500  # covers the corpus' fuzzy-pair mass at test SFs; fixed at scale


def qa18_blocking_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of dd9's (lang, length-bucket) blocking against
    exact all-pairs prefix edit distance — on a bounded sample, the
    qa15 pattern applied to entity resolution: dd9's docstring states
    the straddle-a-bucket-boundary recall trade; this gate MEASURES
    it, so a blocking-key change that silently tanks recall fails a
    correctness gate.

    Truth = all pairs in the sample with prefix distance <= the dd9
    threshold (O(sample²), constant at any corpus size, behind the
    doc_id pushdown); found = dd9's blocked pairs restricted to the
    sample (block membership is per-doc, so the restriction is
    exact)."""
    from .dedup import DD9_MAX_DIST, DD9_PREFIX, dd9_fuzzy_pairs
    from ..catalog import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < QA18_SAMPLE
    )
    d = docs.select(
        "doc_id", "lang", F.substring("text", 1, DD9_PREFIX).alias("pfx")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("pfx").alias("pfx_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("pfx").alias("pfx_b"),
    )
    truth = (
        a.crossJoin(F.broadcast(b))
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("lang_a") == F.col("lang_b"))
            & (F.levenshtein("pfx_a", "pfx_b") <= DD9_MAX_DIST)
        )
        .agg(F.count(F.lit(1)).alias("n_truth"))
    )
    found = (
        dd9_fuzzy_pairs(spark, sf_dir)
        .where(
            (F.col("doc_a") < QA18_SAMPLE) & (F.col("doc_b") < QA18_SAMPLE)
        )
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    return truth.crossJoin(F.broadcast(found)).select(
        "n_truth",
        "n_found",
        (
            F.col("n_found").cast("double")
            / F.nullif(F.col("n_truth").cast("double"), F.lit(0.0))
        ).alias("recall"),
    )


def _qa18_oracle() -> str:
    from .dedup import DD9_MAX_DIST, DD9_PREFIX, DD9_BLOCK_CHARS

    return f"""
WITH s AS (
    SELECT doc_id, lang, n_chars,
           substr(text, 1, {DD9_PREFIX}) AS pfx
    FROM documents WHERE doc_id < {QA18_SAMPLE}
),
truth AS (
    SELECT COUNT(*) AS n_truth
    FROM s a JOIN s b
      ON a.doc_id < b.doc_id AND a.lang = b.lang
    WHERE levenshtein(a.pfx, b.pfx) <= {DD9_MAX_DIST}
),
found AS (
    SELECT COUNT(*) AS n_found
    FROM s a JOIN s b
      ON a.doc_id < b.doc_id AND a.lang = b.lang
     AND a.n_chars // {DD9_BLOCK_CHARS} = b.n_chars // {DD9_BLOCK_CHARS}
    WHERE levenshtein(a.pfx, b.pfx) <= {DD9_MAX_DIST}
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_found AS BIGINT) AS n_found,
       CAST(n_found AS DOUBLE) / NULLIF(CAST(n_truth AS DOUBLE), 0.0)
           AS recall
FROM truth, found
"""


QUERIES = {
    "tx14_langid_confusion": tx14_langid_confusion,
    "sim6_ivf_recall": sim6_ivf_recall,
    "qa18_blocking_recall": qa18_blocking_recall,
}
ORACLES = {
    "tx14_langid_confusion": TX14_ORACLE,
    "sim6_ivf_recall": SIM6_ORACLE,
    "qa18_blocking_recall": _qa18_oracle(),
}
