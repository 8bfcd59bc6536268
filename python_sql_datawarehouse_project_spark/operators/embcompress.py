"""Embedding compression audits over the `embeddings` table — the
"can we afford to store/serve these vectors smaller?" screens a
100 TB vector corpus runs before committing to a storage format
(BASELINE.json ANN-family extension; no counterpart in the reference
repo).

  emb3_int8_quant       per-vector symmetric int8 quantization and
                        its exact reconstruction error, reported per
                        label — the go/no-go audit for 4x vector
                        storage compression
  emb4_matryoshka       energy retained by the first 16 of 64
                        dimensions — the audit for Matryoshka-style
                        prefix truncation (serve short vectors, keep
                        long ones for re-ranking)

Cross-engine determinism:
  * The quantized component is recomputed inside a SINGLE-argument
    transform on both engines (err_i = x - floor(x/amax*127 + 0.5)
    * amax/127) — identical parse trees, no zip/index lambda whose
    semantics could differ.  floor(x + 0.5) replaces round() because
    the engines disagree on round-half ties; floor over identical
    doubles cannot.
  * Per-vector error sums use the sequential double fold
    (functions/hashing.dot_fold <-> list_dot_product, verified
    bitwise-identical).
  * Per-label MEANS of those doubles would be summation-order-
    dependent, so they route through int64 fixed point (the sim4 /
    emb1 trick): q = floor(x * 2^40), exact integer addition, one
    final double division at publish.  Headroom: sse <= dim *
    (amax/254)^2 stays far below 2^63/2^40 per row; the SUM is exact
    to ~3e8 vectors per label at these magnitudes — documented
    bound, assert-checked against overflow by construction (values
    are bounded by the clamp-free |x| <= amax identity).
  * MIN/MAX over doubles are order-free and stay exact.

Scale design (100 TB of embeddings):
  * Both audits are ONE scan, all per-vector math map-side inside a
    single projection (no UDF, no shuffle of vectors); the only
    exchange carries |label| x few-column partial-aggregate rows.
  * Zero-amax vectors (all-components-zero) are filtered identically
    on both engines rather than dividing by zero into NaN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import hashing as H

EMB_DIM = H.RP_DIM  # 64
EMB3_LEVELS = 127.0  # symmetric int8: q in [-127, 127]
FIX_Q = float(1 << 40)  # fixed-point scale for order-free label means
EMB4_PREFIX = 16
EMB4_WEAK = 0.2


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


# -- emb3: int8 quantization reconstruction-error audit ---------------
def emb3_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label reconstruction error of symmetric per-vector int8
    quantization (scale = amax/127): mean and worst squared error.

    A label whose max_sse spikes tells you its vectors have outlier
    components that blow the shared scale — the corpus answer to
    "quantize everything, or keep float16 for these?"."""
    v = _vectors(spark, sf_dir)
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    q = v.withColumn("amax", amax).where(F.col("amax") > 0.0)
    err = F.transform(
        F.col("v"),
        lambda x: x
        - F.floor(x / F.col("amax") * F.lit(EMB3_LEVELS) + F.lit(0.5))
        * F.col("amax")
        / F.lit(EMB3_LEVELS),
    )
    sse = q.select(
        "label", H.dot_fold(err, err).alias("sse")
    )
    return (
        sse.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.floor(F.col("sse") * F.lit(FIX_Q)).cast("long")).alias(
                "qsum"
            ),
            F.max("sse").alias("max_sse"),
        )
        .select(
            "label",
            "n_vecs",
            (
                F.col("qsum").cast("double")
                / F.lit(FIX_Q)
                / F.col("n_vecs").cast("double")
            ).alias("avg_sse"),
            "max_sse",
        )
    )


EMB3_ORACLE = f"""
WITH e AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings
),
scaled AS (
    SELECT label,
           list_max(list_transform(v, x -> abs(x))) AS amax, v
    FROM e
),
erred AS (
    SELECT label,
           list_transform(
               v,
               x -> x - floor(x / amax * {EMB3_LEVELS!r} + 0.5)
                        * amax / {EMB3_LEVELS!r}
           ) AS err
    FROM scaled
    WHERE amax > 0.0
),
sse AS (
    SELECT label, {H.sql_dot('err', 'err')} AS sse FROM erred
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST(floor(sse * {FIX_Q!r}) AS BIGINT)) AS DOUBLE)
           / {FIX_Q!r} / CAST(COUNT(*) AS DOUBLE) AS avg_sse,
       MAX(sse) AS max_sse
FROM sse
GROUP BY label
"""


# -- emb4: Matryoshka prefix-energy audit -----------------------------
def emb4_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy captured by the first EMB4_PREFIX dimensions, per label:
    retained = ||v[:16]||^2 / ||v||^2 (scale-invariant, so raw
    vectors need no normalization).  Labels with low avg or many
    weak vectors cannot be served truncated."""
    v = _vectors(spark, sf_dir)
    head = F.slice(F.col("v"), 1, EMB4_PREFIX)
    full = H.dot_fold(F.col("v"), F.col("v"))
    retained = (H.dot_fold(head, head) / full).alias("retained")
    r = v.where(full > 0.0).select("label", retained)
    return (
        r.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.floor(F.col("retained") * F.lit(FIX_Q)).cast("long")
            ).alias("qsum"),
            F.min("retained").alias("min_retained"),
            F.sum(
                F.when(F.col("retained") < EMB4_WEAK, 1).otherwise(0)
            ).alias("n_weak"),
        )
        .select(
            "label",
            "n_vecs",
            (
                F.col("qsum").cast("double")
                / F.lit(FIX_Q)
                / F.col("n_vecs").cast("double")
            ).alias("avg_retained"),
            "min_retained",
            F.col("n_weak").cast("long").alias("n_weak"),
        )
    )


EMB4_ORACLE = f"""
WITH e AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings
),
r AS (
    SELECT label,
           {H.sql_dot('v[1:{k}]'.format(k=EMB4_PREFIX),
                      'v[1:{k}]'.format(k=EMB4_PREFIX))}
           / {H.sql_dot('v', 'v')} AS retained
    FROM e
    WHERE {H.sql_dot('v', 'v')} > 0.0
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST(floor(retained * {FIX_Q!r}) AS BIGINT)) AS DOUBLE)
           / {FIX_Q!r} / CAST(COUNT(*) AS DOUBLE) AS avg_retained,
       MIN(retained) AS min_retained,
       CAST(SUM(CASE WHEN retained < {EMB4_WEAK} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_weak
FROM r
GROUP BY label
"""


QUERIES = {
    "emb3_int8_quant": emb3_int8_quant,
    "emb4_matryoshka": emb4_matryoshka,
}

ORACLES = {
    "emb3_int8_quant": EMB3_ORACLE,
    "emb4_matryoshka": EMB4_ORACLE,
}
