"""Tokenizer-training preparation: the BPE first-merge pair census.

  tx19_bpe_pair_census   corpus-wide adjacent-character-pair counts,
                         weighted by word frequency — the statistic
                         byte-pair-encoding training consumes to pick
                         its first merge (and, re-run after each
                         merge, every subsequent one)

BPE training is a loop of "count adjacent symbol pairs over the word-
frequency table, merge the argmax"; the distributed-expensive part is
THIS census (the merge itself touches only words containing the
winning pair).  tx9's bigram lift counts WORD bigrams for collocation
mining; this gate counts CHARACTER pairs inside words for vocabulary
induction — different unit, different consumer.

Scale design (100 TB): two map-side-combinable hash aggregations and
nothing else.  (1) word -> frequency: the exploded token stream
collapses per-task before the exchange, so the shuffle carries one
row per distinct word per task — vocabulary-sized, not corpus-sized.
(2) pair -> counts: pairs are built per ROW of the vocabulary table
with a pure array expression (substring slide — no UDF), so the
second shuffle is bounded by |alphabet|^2 per task.  Both weighted
(sum of word frequencies) and unweighted-by-type (distinct words
containing the pair) counts come from the same aggregate.  At real
scale the vocabulary table is the natural persisted intermediate; a
full BPE trainer iterates census -> merge on it without touching the
corpus again.

Engine portability: substring(word, i, 2) slides the pair window
identically on both engines; all outputs are exact int64 counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .text import _sql_tokens, _tokens


def tx19_bpe_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(_tokens(F.col("text"))).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        "word",
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.sum("freq").alias("n_occurrences"),
        F.countDistinct("word").alias("n_words"),
    )


TX19_ORACLE = f"""
WITH words AS (
    SELECT word, COUNT(*) AS freq
    FROM (
        SELECT unnest({_sql_tokens("text")}) AS word FROM documents
    )
    WHERE len(word) >= 2
    GROUP BY word
),
pairs AS (
    SELECT word, freq, substring(word, i, 2) AS pair
    FROM words, unnest(range(1, len(word))) AS g(i)
)
SELECT pair,
       CAST(SUM(freq) AS BIGINT) AS n_occurrences,
       COUNT(DISTINCT word) AS n_words
FROM pairs
GROUP BY pair
"""


QUERIES = {"tx19_bpe_pair_census": tx19_bpe_pair_census}
ORACLES = {"tx19_bpe_pair_census": TX19_ORACLE}
