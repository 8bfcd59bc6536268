"""Corpus-wide repeated-span census — the first phase of exact-
substring training-data deduplication (the "repeated 50-token span"
family popularized by suffix-array dedup of LM corpora; this is the
bounded-window Spark-native equivalent).

  dd15_repeated_spans   every word-K-gram that appears in >= 2
                        DISTINCT documents, with its document
                        frequency, total occurrence count and the
                        lowest doc_id containing it (the remediation
                        anchor)

Relation to the existing gates: tx7 measures repetition WITHIN one
document, tx6 measures overlap against a benchmark split, dd2/dd3
score document PAIRS; none of them answers "which exact spans are
duplicated across the corpus, and how often" — the census an exact-
substring scrubber consumes directly (cut every occurrence after the
first), and the memorization-hazard report reviewers read.

Scale design (100 TB): the span list per document is a pure per-row
array expression (no UDF, whole-stage codegen), and the census is ONE
hash aggregation keyed by the span — partial (map-side) aggregation
collapses each task's spans before the exchange, so the shuffle
carries one row per DISTINCT span per task, not one row per token.
COUNT(DISTINCT doc_id) plans as the standard two-phase expand over
(span, doc_id) — both phases combine map-side.  The >= 2-docs filter
drops the overwhelmingly-unique tail AFTER the final aggregate, which
is the earliest it is knowable.  At suffix-array scale one would
group on xxhash64(span) and re-join the text of the survivors only;
here the span text rides the aggregation directly because the output
IS the span report (documented trade: ~30-byte keys vs an extra
join — flip at real corpus scale).

Reference basis: the reference has no cross-document span machinery
(its dedup surface is the silver ROW_NUMBER dedup, SURVEY §2.5 W1);
this gate extends the engine for LM-corpus curation per the build
mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .text import _sql_tokens, _tokens

SPAN_K = 5  # tokens per span; >= 2-doc 5-gram collisions in random
# text are ~n^2/vocab^5 (negligible) — survivors are real duplication.


def dd15_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", _tokens(F.col("text")).alias("tk"))
        .where(F.size("tk") >= SPAN_K)
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (SPAN_K - 1)),
                lambda i: F.array_join(F.slice("tk", i, SPAN_K), " "),
            )
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
    )


DD15_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_sql_tokens("text")} AS tk FROM documents
),
spans AS (
    SELECT doc_id,
           array_to_string(list_slice(tk, i, i + {SPAN_K - 1}), ' ') AS span
    FROM toks, unnest(range(1, len(tk) - {SPAN_K - 2})) AS g(i)
    WHERE len(tk) >= {SPAN_K}
)
SELECT span,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences,
       MIN(doc_id) AS first_doc_id
FROM spans
GROUP BY span
HAVING COUNT(DISTINCT doc_id) >= 2
"""


QUERIES = {"dd15_repeated_spans": dd15_repeated_spans}
ORACLES = {"dd15_repeated_spans": DD15_ORACLE}
