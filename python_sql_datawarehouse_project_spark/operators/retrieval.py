"""Lexical retrieval scoring over the document corpus — BM25 with a
rational (log-free) idf, the engine-portable variant of the scoring
every retrieval-augmented data pipeline runs to mine/query corpora.

  tx18_bm25_scores   per-document BM25 score for a fixed 3-term
                     query, plus the document length the saturation
                     term normalized by

What BM25 adds over tx5's tf-idf: term-frequency SATURATION (a term's
second occurrence is worth less than its first: tf*(k1+1)/(tf+k1*..))
and DOCUMENT-LENGTH normalization (the b*dl/avgdl penalty), the two
properties that made BM25 the lexical baseline.  idf uses the exact
rational core of the Robertson formula, (N - df + 0.5)/(df + 0.5),
WITHOUT the ln() wrap: libm log() is not bitwise-portable across
engines (same policy as tx5:281/tx9/tx11 — every log-free gate in
text.py), and ln is monotone so per-term ordering is preserved; the
docstring is the contract that scores are on the rational-idf scale.

Float determinism (partition-order proof): every factor is computed
per row from exact integers (tf, dl via per-row list_filter/size —
no explode, no shuffle) and THREE corpus scalars (N, df_i, sum_dl)
that are exact int64 aggregates; the doubles appear only in one fixed
expression tree evaluated per row, and the cross-term sum is a
LITERAL-ORDER three-term add (score of term 1 + term 2 + term 3), not
an aggregation — so the result is independent of partition count and
row order by construction.  The identical tree is written on both
engines.

Scale design (100 TB): one corpus-stats aggregate (4 int64 columns,
one row) broadcast against the document scan; everything else is
per-row whole-stage-codegen arithmetic — zero joins, zero exchanges
beyond the 1-row stats merge.  A multi-query batch version would
broadcast a query-term table and pivot, same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .text import _sql_tokens, _tokens

BM25_TERMS = ("spark", "join", "window")  # fixed probe query
BM25_K1 = 1.2
BM25_B = 0.75
# Folded identically on both engines; derived so a BM25_B / BM25_K1
# change cannot silently drift from these literals (ADVICE r6 #2).
_ONE_MINUS_B = 1 - BM25_B
_K1_PLUS_1 = BM25_K1 + 1


def _tf(term: str):
    return F.size(F.filter(F.col("tk"), lambda x: x == F.lit(term)))


def tx18_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", _tokens(F.col("text")).alias("tk"))
        .where(F.size("tk") >= 1)
    )
    tf = toks.select(
        "doc_id",
        F.size("tk").alias("dl"),
        *[_tf(t).alias(f"tf{i}") for i, t in enumerate(BM25_TERMS, 1)],
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(1, len(BM25_TERMS) + 1)
        ],
    )
    j = tf.crossJoin(F.broadcast(stats)).withColumn(
        "avgdl", F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    )

    def score(i: int):
        tf_d = F.col(f"tf{i}").cast("double")
        idf = (
            F.col("n_docs").cast("double")
            - F.col(f"df{i}").cast("double")
            + F.lit(0.5)
        ) / (F.col(f"df{i}").cast("double") + F.lit(0.5))
        denom = tf_d + F.lit(BM25_K1) * (
            F.lit(_ONE_MINUS_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
        return F.when(
            F.col(f"tf{i}") > 0, idf * (tf_d * F.lit(_K1_PLUS_1)) / denom
        ).otherwise(F.lit(0.0))

    total = score(1) + score(2) + score(3)
    return (
        j.select("doc_id", "dl", total.alias("bm25"))
        .where(F.col("bm25") > 0)
    )


def _sql_score(i: int) -> str:
    return f"""CASE WHEN tf{i} > 0 THEN
        ((CAST(n_docs AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)
             / (CAST(df{i} AS DOUBLE) + 0.5))
        * (CAST(tf{i} AS DOUBLE) * {_K1_PLUS_1!r})
        / (CAST(tf{i} AS DOUBLE) + {BM25_K1!r} * ({_ONE_MINUS_B!r}
               + {BM25_B!r} * CAST(dl AS DOUBLE) / avgdl))
        ELSE 0.0 END"""


_TF_COLS = ",\n           ".join(
    f"CAST(len(list_filter(tk, x -> x = '{t}')) AS INT) AS tf{i}"
    for i, t in enumerate(BM25_TERMS, 1)
)
_DF_COLS = ",\n           ".join(
    f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
    for i in range(1, len(BM25_TERMS) + 1)
)

TX18_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_sql_tokens("text")} AS tk FROM documents
),
tf AS (
    SELECT doc_id, CAST(len(tk) AS INT) AS dl,
           {_TF_COLS}
    FROM toks WHERE len(tk) >= 1
),
stats AS (
    SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
           {_DF_COLS}
    FROM tf
),
scored AS (
    SELECT doc_id, dl,
           {_sql_score(1)} + {_sql_score(2)} + {_sql_score(3)} AS bm25
    FROM tf CROSS JOIN (
        SELECT *, CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
        FROM stats
    )
)
SELECT doc_id, dl, bm25 FROM scored WHERE bm25 > 0
"""


QUERIES = {"tx18_bm25_scores": tx18_bm25_scores}
ORACLES = {"tx18_bm25_scores": TX18_ORACLE}
