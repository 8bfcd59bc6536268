"""Embedding-space quality control over the `embeddings` table —
the "drop mis-embedded / mislabeled rows before training" filter of
a large-scale training-data pipeline (BASELINE.json ANN-family
extension; no counterpart in the reference repo).

  emb1_centroid_outliers   per-label centroid, then the 5 vectors
                           per label LEAST similar to their own
                           centroid — the standard
                           embedding-coherence outlier screen

Cross-engine determinism (the float-mean trap, solved the sim4 way):
a per-label MEAN of doubles is summation-order-dependent, so the
centroid is instead built from int64 fixed-point component sums
(q = floor(x * 2^18), exact integer addition — order-free).  Cosine
is scale-invariant, so the UN-divided sum vector IS the centroid for
scoring purposes: no mean, no division, no error.  Scoring then uses
the same sequential-fold double dot product as sim1-4 (bitwise
cross-engine, functions/hashing.py), against the exact integer sums
cast to double.

int64 headroom: |q| <= 2^18 per component (vectors are pre-normalized
so |x| <= 1), so component sums stay exact below 2^45 vectors per
label — effectively unbounded.  The double fold over cv*cv peaks at
~64*(2^18*n)^2, inside double range for any real corpus.

Scale design (100 TB of embeddings):
  * Centroid build: one posexplode + codegen'd integer SUM with
    map-side partial aggregation — the shuffle carries (label, dim)
    partials only, label_count x 64 rows.
  * Scoring: the centroid table (labels x 64 doubles) broadcasts;
    each vector is scored map-side with a single fold — no shuffle.
  * Per-label bottom-5: rank window partitioned by label; at scale
    this is the same bounded per-group top-k as q5 (partial heaps
    under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import hashing as H

EMB_Q = 1 << 18
EMB_DIM = H.RP_DIM  # 64 — the embeddings table's dimensionality
EMB_OUTLIERS = 5


def _norm_with_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """similarity._emb_normalized, keeping the label column (same
    norm expression so the vn doubles agree bitwise with the oracle
    CTE)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    emb = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
    return emb.withColumn(
        "nrm", F.sqrt(H.dot_fold(F.col("v"), F.col("v")))
    ).select(
        "vec_id",
        "label",
        F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("vn"),
    )


def emb1_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-EMB_OUTLIERS cosine-to-own-label-centroid per label.

    Low cosine to the label centroid = the vector disagrees with its
    cohort — the screen that catches mislabeled rows and embedding-
    service failures before they reach a training mix."""
    # Checkpointed once: the normalized frame feeds the centroid build
    # AND the scoring join (two references — without materialization
    # the sqrt-fold normalization runs twice, the same shared-subplan
    # rule dd6 applies; measured ~2.4 -> ~1.7 s at sf0.1).
    n = _norm_with_label(spark, sf_dir).localCheckpoint(eager=True)
    quant = n.select(
        "label",
        F.transform(
            F.col("vn"), lambda x: F.floor(x * F.lit(float(EMB_Q)))
        ).alias("qv"),
    )
    cent = (
        quant.select("label", F.posexplode("qv").alias("j", "x"))
        .groupBy("label", "j")
        .agg(F.sum("x").alias("s"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "s"))),
                lambda t: t.getField("s").cast("double"),
            ).alias("cv")
        )
        .withColumn("cn", F.sqrt(H.dot_fold(F.col("cv"), F.col("cv"))))
    )
    scored = n.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        (H.dot_fold(F.col("vn"), F.col("cv")) / F.col("cn")).alias("cosine"),
    )
    w = Window.partitionBy("label").orderBy(F.asc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= EMB_OUTLIERS)
        .select("label", "vec_id", "cosine", "rank")
    )


EMB1_ORACLE = f"""
WITH e AS (
    SELECT vec_id, label,
           list_transform(v, x -> x / sqrt({H.sql_dot('v', 'v')})) AS vn
    FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings)
),
q AS (
    SELECT label,
           list_transform(vn, x -> CAST(floor(x * {float(EMB_Q)!r})
                                        AS BIGINT)) AS qv
    FROM e
),
dims AS (SELECT unnest(range(0, {EMB_DIM})) AS j),
sums AS (
    SELECT label, j, CAST(SUM(qv[j + 1]) AS BIGINT) AS s
    FROM q, dims GROUP BY label, j
),
cent AS (
    SELECT label, list(CAST(s AS DOUBLE) ORDER BY j) AS cv
    FROM sums GROUP BY label
),
scored AS (
    SELECT e.label, e.vec_id,
           {H.sql_dot('e.vn', 'c.cv')} / sqrt({H.sql_dot('c.cv', 'c.cv')})
               AS cosine
    FROM e JOIN cent c ON e.label = c.label
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY label ORDER BY cosine ASC, vec_id ASC) AS rank
    FROM scored
)
SELECT label, vec_id, cosine, rank FROM ranked WHERE rank <= {EMB_OUTLIERS}
"""


def emb2_dimension_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION corpus profile: n, quantized mean, min/max and
    exact-zero share for each of the 64 embedding components — the
    drift screen for the embedding SERVICE rather than the corpus
    (a dimension whose mean wanders or collapses to zero flags a
    model/version change upstream; emb1 screens per-label coherence,
    this screens the space itself).

    Determinism: the mean is the int64 fixed-point component sum
    (exact, order-free — the sim4/emb1 trick) divided by count and by
    the scale in a fixed two-division order; min/max/zero-count are
    order-free by definition.

    Scale: one posexplode + a 64-group aggregate with map-side
    partials — the shuffle carries (dim, partial) rows only."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    comp = emb.select(F.posexplode("v").alias("j", "x"))
    q = F.floor(F.col("x") * F.lit(float(EMB_Q))).cast("long")
    return (
        comp.groupBy("j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(q).alias("_sq"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.sum(F.when(F.col("x") == 0.0, 1).otherwise(0)).alias("n_zero"),
        )
        .select(
            "j",
            "n",
            (
                F.col("_sq").cast("double")
                / F.col("n").cast("double")
                / F.lit(float(EMB_Q))
            ).alias("mean_q"),
            "min_x",
            "max_x",
            (F.col("n_zero").cast("double") / F.col("n").cast("double")).alias(
                "frac_zero"
            ),
        )
        .orderBy("j")
    )


EMB2_ORACLE = f"""
WITH comp AS (
    SELECT j, v[j + 1] AS x
    FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         (SELECT unnest(range(0, {EMB_DIM})) AS j)
),
agg AS (
    SELECT j, COUNT(*) AS n,
           CAST(SUM(CAST(floor(x * {float(EMB_Q)!r}) AS BIGINT)) AS BIGINT)
               AS sq,
           MIN(x) AS min_x, MAX(x) AS max_x,
           CAST(SUM(CASE WHEN x = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero
    FROM comp GROUP BY j
)
SELECT CAST(j AS INTEGER) AS j, n,
       CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / {float(EMB_Q)!r} AS mean_q,
       min_x, max_x,
       CAST(n_zero AS DOUBLE) / CAST(n AS DOUBLE) AS frac_zero
FROM agg
ORDER BY j
"""


QUERIES = {
    "emb1_centroid_outliers": emb1_centroid_outliers,
    "emb2_dimension_profile": emb2_dimension_profile,
}
ORACLES = {
    "emb1_centroid_outliers": EMB1_ORACLE,
    "emb2_dimension_profile": EMB2_ORACLE,
}
