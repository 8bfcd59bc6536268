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
    cohort — recall per class sits on the diagonal."""
    preds = tx3_language_id(spark, sf_dir).select(
        "labeled_lang", "predicted_lang"
    )
    counts = preds.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = preds.groupBy("labeled_lang").agg(
        F.count(F.lit(1)).alias("n_labeled")
    )
    return counts.join(F.broadcast(totals), "labeled_lang").select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.col("n_labeled").cast("double")
        ).alias("share_of_label"),
    )


TX14_ORACLE = f"""
WITH preds AS (SELECT * FROM ({TX3_ORACLE}) t),
counts AS (
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
    FROM preds GROUP BY 1, 2
),
totals AS (
    SELECT labeled_lang, COUNT(*) AS n_labeled FROM preds GROUP BY 1
)
SELECT c.labeled_lang, c.predicted_lang, c.n_docs,
       CAST(c.n_docs AS DOUBLE) / CAST(t.n_labeled AS DOUBLE)
           AS share_of_label
FROM counts c JOIN totals t ON c.labeled_lang = t.labeled_lang
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


QUERIES = {
    "tx14_langid_confusion": tx14_langid_confusion,
    "sim6_ivf_recall": sim6_ivf_recall,
}
ORACLES = {
    "tx14_langid_confusion": TX14_ORACLE,
    "sim6_ivf_recall": SIM6_ORACLE,
}
