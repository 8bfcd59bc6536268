"""Text-analysis operators over the `documents` table — the
LLM-training-data extensions (BASELINE.json north star; the reference
repo has no text analytics, its closest surface is the string-cleanse
kit of SURVEY.md §2.8).

  tx1_token_count      whitespace + BPE-ish regex token counts
  tx2_quality_score    length / punctuation / stopword-ratio scoring
  tx3_language_id      n-gram (function-word) language heuristic
  tx4_fingerprint      md5 + Karp-Rabin rolling-hash fingerprints

All four are pure per-row column expressions: no shuffle at all, no
UDFs, fully whole-stage-codegen'd — at 100 TB they run at parquet scan
speed with predicate pushdown intact.  Every query has a bit-exact
DuckDB oracle (same normalization regexes, same fold arithmetic — see
functions/hashing.py for the verified portability contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import hashing as H

# Shared normalization: lowercase, strip non-alphanumerics, collapse
# runs of whitespace.  NOTE the DuckDB regexp_replace needs the 'g'
# flag to match Spark's replace-all default.
_STRIP_RE = "[^a-z0-9 ]"
_WS_RE = "\\s+"
# BPE-ish token regex: letter runs, digit runs, or single symbols.
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "on", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "mit", "von", "auf"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "sur"],
}
_ALL_STOP = sorted({w for ws in STOPWORDS.values() for w in ws})


def _norm(col: Column) -> Column:
    s = F.regexp_replace(F.lower(col), _STRIP_RE, " ")
    return F.trim(F.regexp_replace(s, _WS_RE, " "))


def _sql_norm(expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), "
        f"'{_STRIP_RE}', ' ', 'g'), '{_WS_RE}', ' ', 'g'))"
    )


def _tokens(col: Column) -> Column:
    return F.split(_norm(col), _WS_RE)


def _sql_tokens(expr: str) -> str:
    return f"string_split_regex({_sql_norm(expr)}, '{_WS_RE}')"


def _sql_str_list(xs: list[str]) -> str:
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


# -- tx1: token counting ---------------------------------------------
def tx1_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.size(_tokens(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


TX1_ORACLE = f"""
SELECT
    doc_id,
    length(text) AS n_chars_measured,
    len({_sql_tokens('text')}) AS n_ws_tokens,
    len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens
FROM documents
"""


# -- tx2: quality scoring --------------------------------------------
def quality_scored(docs: DataFrame) -> DataFrame:
    """tx2's per-document quality signals, keeping lang alongside so
    downstream per-cohort consumers (mix.ds5) reuse the identical
    expression tree (the doubles must agree bitwise with the shared
    SQL_QUALITY_SCORED oracle fragment)."""
    n = F.length("text").cast("double")
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
    punct = F.length(F.regexp_replace("text", "[a-zA-Z0-9\\s]", "")).cast("double")
    toks = _tokens(F.col("text"))
    n_toks = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(F.lit(_ALL_STOP), t))
    ).cast("double")
    alpha_ratio = alpha / n
    punct_ratio = punct / n
    stop_ratio = stop_hits / n_toks
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        "lang",
        # whitespace token count rides along so consumers that need
        # score AND size (mix.ds2's budget fill) stay single-scan
        # instead of joining a second documents projection
        F.size(toks).alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_scored(docs).drop("lang", "n_tokens")


TX2_ORACLE = f"""
WITH base AS (
    SELECT
        doc_id,
        CAST(length(text) AS DOUBLE) AS n,
        CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha,
        CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
        {_sql_tokens('text')} AS toks
    FROM documents
), ratios AS (
    SELECT
        doc_id,
        alpha / n AS alpha_ratio,
        punct / n AS punct_ratio,
        CAST(len(list_filter(toks, t -> list_contains({_sql_str_list(_ALL_STOP)}, t))) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE) AS stopword_ratio
    FROM base
)
SELECT
    doc_id, alpha_ratio, punct_ratio, stopword_ratio,
    0.4 * alpha_ratio + 0.3 * (1.0 - punct_ratio)
        + 0.3 * least(stopword_ratio * 5.0, 1.0) AS quality_score
FROM ratios
"""

# Shared oracle fragment: tx2's scoring with lang attached, as a
# parenthesized subquery usable in any consumer's FROM clause (keeps
# the formula single-sourced between tx2 and mix.ds5).
SQL_QUALITY_SCORED = f"""(
    SELECT doc_id, lang,
           0.4 * (alpha / n) + 0.3 * (1.0 - punct / n)
               + 0.3 * least((stop_hits / n_toks) * 5.0, 1.0)
               AS quality_score
    FROM (
        SELECT doc_id, lang,
               CAST(length(text) AS DOUBLE) AS n,
               CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                    AS DOUBLE) AS alpha,
               CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                    AS DOUBLE) AS punct,
               CAST(len(list_filter({_sql_tokens('text')},
                    t -> list_contains({_sql_str_list(_ALL_STOP)}, t)))
                    AS DOUBLE) AS stop_hits,
               CAST(len({_sql_tokens('text')}) AS DOUBLE) AS n_toks
        FROM documents
    )
)"""


# -- tx3: language identification ------------------------------------
def _hit_counter(ws: list[str]):
    # closure factory: a 2-arg filter() lambda would receive
    # (element, index), clobbering a default-arg capture
    return lambda t: F.array_contains(F.lit(ws), t)


def tx3_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Tokenize ONCE into real columns, then build the argmax CASE over
    # the column references: inlining _tokens() into every hit
    # expression copies the split+regex subtree ~20x into the CASE
    # tree, and downstream plans that fuse this projection into an
    # aggregate (tx14's confusion counts) lose common-subexpression
    # elimination and re-run the regex per copy (measured: tx14
    # 3.3 -> 1.0 s at sf0.1; tx3 itself is unchanged because its
    # stand-alone Project was already CSE'd).
    langs = sorted(STOPWORDS)  # deterministic tie-break: alphabetical
    with_hits = docs.select(
        "doc_id",
        "lang",
        _tokens(F.col("text")).alias("_toks"),
    ).select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(F.col("_toks"), _hit_counter(STOPWORDS[la])))
            .alias(f"hits_{la}")
            for la in langs
        ],
    )
    hits = {la: F.col(f"hits_{la}") for la in langs}
    pred = F.lit("unknown")
    best = F.greatest(*[hits[la] for la in langs])
    for la in reversed(langs):
        pred = F.when(hits[la] == best, F.lit(la)).otherwise(pred)
    pred = F.when(best == 0, F.lit("unknown")).otherwise(pred)
    return with_hits.select(
        "doc_id",
        *[f"hits_{la}" for la in langs],
        pred.alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
    )


def _tx3_oracle() -> str:
    langs = sorted(STOPWORDS)
    hit_cols = ",\n        ".join(
        f"len(list_filter(toks, t -> list_contains("
        f"{_sql_str_list(STOPWORDS[la])}, t))) AS hits_{la}"
        for la in langs
    )
    best = "greatest(" + ", ".join(f"hits_{la}" for la in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'unknown' "
    for la in langs:
        case += f"WHEN hits_{la} = {best} THEN '{la}' "
    case += "ELSE 'unknown' END"
    return f"""
WITH base AS (
    SELECT doc_id, lang, {_sql_tokens('text')} AS toks FROM documents
), scored AS (
    SELECT doc_id, lang,
        {hit_cols}
    FROM base
)
SELECT doc_id, {', '.join(f'hits_{la}' for la in langs)},
       {case} AS predicted_lang,
       lang AS labeled_lang
FROM scored
"""


TX3_ORACLE = _tx3_oracle()


# -- tx4: document fingerprinting ------------------------------------
def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = _norm(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        H.poly_fingerprint(F.split(norm, "")).alias("fp_rolling"),
    )


TX4_ORACLE = f"""
SELECT
    doc_id,
    md5({_sql_norm('text')}) AS fp_md5,
    {H.sql_poly_fingerprint(f"string_split({_sql_norm('text')}, '')")} AS fp_rolling
FROM documents
"""


# -- tx5: TF-IDF top terms per document ------------------------------
TFIDF_TOP_K = 5


def tx5_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-TFIDF_TOP_K terms.  The idf is the RAW rational
    N/df, not log(N/df): libm log() is not bitwise-portable across
    engines, while tf*N/df is integer math plus one correctly-rounded
    IEEE division — the ranking it induces per document is identical
    to the log form (log is monotone), so nothing analytical is lost.

    Scale: explode -> two hash aggregations (doc-term tf, term df)
    with map-side partials, one join keyed on term (vocabulary-sized
    build side, AQE picks the strategy), and the per-doc top-k window
    repartitions by doc_id only.  N rides in as a broadcast 1-row
    cross join, not a driver constant baked into the plan."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


TX5_ORACLE = f"""
WITH terms AS (
    SELECT doc_id, unnest({_sql_tokens('text')}) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf
    FROM terms WHERE term <> '' GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS tfidf
    FROM tf JOIN df ON tf.term = df.term, n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


# -- tx6: benchmark decontamination ----------------------------------
# 4-gram overlap: real pipelines run 8-13-gram windows, but the
# synthetic corpus' sentences diverge after ~4 shared tokens, so 4 is
# the size at which the test tables exhibit contamination; the
# operator is gram-size-parametric either way.
DECON_NGRAM = 4
BENCH_MOD = 100


def _doc_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, h): distinct md5-hashed word-8-grams per document.

    `array_distinct` BEFORE the explode keeps the per-doc gram set
    local — no (doc_id, gram) distinct shuffle ever happens, and the
    exploded stream carries 8-byte hashes, never the gram strings.
    """
    toks = docs.select(
        "doc_id", _tokens(F.col("text")).alias("tk")
    ).where(F.size("tk") >= DECON_NGRAM)
    return toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1), F.size("tk") - (DECON_NGRAM - 1)
                    ),
                    lambda i: H.md5_long(
                        F.array_join(F.slice("tk", i, DECON_NGRAM), " ")
                    ),
                )
            )
        ).alias("h"),
    )


def tx6_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    distinct word-8-grams also appear in the held-out benchmark split
    (docs with doc_id % 100 == 0 stand in for the eval suite — in a
    real pipeline the benchmark side is a separate, tiny, curated
    table).  Output = contaminated docs only, with overlap counts and
    the contaminated-gram fraction.

    Scale: the benchmark gram set is bounded by the eval suite, not
    the corpus — the hash join against it is broadcast-sized in
    practice, but the hint is left to AQE (the mod-split used here
    grows with the table).  Corpus grams stream through exploded as
    hashes with map-side partial counts; two hash aggregations + one
    join, no O(n^2) anywhere."""
    # Materialized once: the gram stream feeds the benchmark set, the
    # per-doc totals AND the overlap probe — three references, and
    # Catalyst does not dedupe common subplans, so without this the
    # tokenize+8-gram+hash explode runs three times over the corpus.
    # The rows are compact (doc_id, hash) longs, the cheap side of
    # PERF.md §4's materialize-vs-recompute rule (~1.8 -> ~1.5 s at
    # sf0.1 — the surviving cost is the join shuffle, not the scan).
    g = _doc_grams(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    corp = g.where(F.col("doc_id") % BENCH_MOD != 0)
    bench = (
        g.where(F.col("doc_id") % BENCH_MOD == 0).select("h").distinct()
    )
    totals = corp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    hits = (
        corp.join(bench, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return totals.join(hits, "doc_id").select(
        "doc_id",
        "n_overlap",
        "n_grams",
        (
            F.col("n_overlap").cast("double")
            / F.col("n_grams").cast("double")
        ).alias("contamination"),
    )


TX6_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_sql_tokens('text')} AS tk FROM documents
),
grams AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(tk) - {DECON_NGRAM - 2}),
        i -> {H.sql_md5_long(
            f"array_to_string(list_slice(tk, i, i + {DECON_NGRAM - 1}), ' ')"
        )}
    ))) AS h
    FROM toks WHERE len(tk) >= {DECON_NGRAM}
),
corp AS (SELECT * FROM grams WHERE doc_id % {BENCH_MOD} <> 0),
bench AS (
    SELECT DISTINCT h FROM grams WHERE doc_id % {BENCH_MOD} = 0
),
totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM corp GROUP BY 1),
hits AS (
    SELECT doc_id, COUNT(*) AS n_overlap
    FROM corp JOIN bench USING (h) GROUP BY 1
)
SELECT t.doc_id, n_overlap, n_grams,
       CAST(n_overlap AS DOUBLE) / CAST(n_grams AS DOUBLE)
           AS contamination
FROM totals t JOIN hits USING (doc_id)
"""


# -- tx7: intra-document repetition ----------------------------------
REP_NGRAM = 3


def tx7_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated word-3-gram fraction per document — the Gopher-class
    repetition filter (a high duplicate-n-gram share marks boilerplate
    and low-quality spins).  dup_frac = 1 - distinct/total over the
    doc's 3-gram multiset.

    Scale: pure per-row array expressions (no shuffle, no UDF); the
    gram list is built once per row and both counts come from it.
    The division is one exact-int-to-double divide — bit-identical
    cross-engine."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("tk")
    ).where(F.size("tk") >= REP_NGRAM)
    grams = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - (REP_NGRAM - 1)),
            lambda i: F.array_join(F.slice("tk", i, REP_NGRAM), " "),
        ).alias("gs"),
    )
    return grams.select(
        "doc_id",
        F.size("gs").alias("n_grams"),
        F.size(F.array_distinct("gs")).alias("n_distinct"),
        (
            (F.size("gs") - F.size(F.array_distinct("gs"))).cast("double")
            / F.size("gs").cast("double")
        ).alias("dup_frac"),
    )


TX7_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_sql_tokens('text')} AS tk FROM documents
),
grams AS (
    SELECT doc_id, list_transform(
        range(1, len(tk) - {REP_NGRAM - 2}),
        i -> array_to_string(list_slice(tk, i, i + {REP_NGRAM - 1}), ' ')
    ) AS gs
    FROM toks WHERE len(tk) >= {REP_NGRAM}
)
SELECT doc_id,
       CAST(len(gs) AS INT) AS n_grams,
       CAST(len(list_distinct(gs)) AS INT) AS n_distinct,
       CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE)
           / CAST(len(gs) AS DOUBLE) AS dup_frac
FROM grams
"""


# -- tx8: token-window chunking --------------------------------------
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def tx8_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed-token-budget chunks with
    overlap — the pretraining packer's unit of work (context-window
    chunking with stride, RAG passage splitting is the same shape).

    Chunk starts come from sequence(0, n-1, stride) so the final
    partial chunk is kept (a doc never loses its tail); slice()
    truncates the last chunk at the token count.  Output carries the
    chunk token count and an md5 of the re-joined text, which is what
    a downstream exact-dedup at chunk grain consumes (dd1 at chunk
    level).

    Scale: per-row array expressions + one explode — no shuffle, no
    UDF; explode multiplies rows ~n/stride x but each output row is a
    bounded-size chunk, so the stage streams at scan speed."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("tk")
    )
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.size("tk") - 1, F.lit(CHUNK_STRIDE)
            )
        ).alias("start"),
        "tk",
    )
    chunk = F.slice("tk", F.col("start") + 1, F.lit(CHUNK_TOKENS))
    return chunks.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


TX8_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_sql_tokens('text')} AS tk FROM documents
),
chunks AS (
    SELECT doc_id, tk,
           unnest(range(0, greatest(len(tk), 1), {CHUNK_STRIDE})) AS start
    FROM toks
),
sliced AS (
    SELECT doc_id, start,
           list_slice(tk, start + 1,
                      least(start + {CHUNK_TOKENS}, len(tk))) AS chunk
    FROM chunks
)
SELECT doc_id,
       CAST(start / {CHUNK_STRIDE} AS INT) AS chunk_id,
       CAST(len(chunk) AS INT) AS n_chunk_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_hash
FROM sliced
"""


# -- tx9: bigram collocations (corpus-level lift) ---------------------
BIGRAM_MIN_COUNT = 5


def tx9_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-word collocation mining: for every bigram seen >=
    BIGRAM_MIN_COUNT times, its corpus lift
    ``P(w1 w2) / (P(w1) P(w2))`` — the PMI ranking without the log
    (log() is not bitwise-portable cross-engine, and lift is monotone
    in PMI, same contract as tx5's rational idf).

    Determinism: lift = ((c_xy * n_uni as double) / c_w1) / c_w2 with
    that exact association on both engines; the int64 product is exact
    (c_xy * n_uni < 2^53 through sf1000's vocabulary) and IEEE-754
    division is deterministic given identical operand order.

    Scale (single-pass since round 9 — the r8 sf10 diagnosis): every
    token occurrence is emitted exactly ONCE as (w1 = tk[i],
    w2 = tk[i+1] or NULL at the doc boundary), so one tokenize scan +
    one explode + ONE map-side-combinable groupBy(w1, w2) produce the
    bigram-grain table from which EVERYTHING else derives —
    unigram counts are SUM(c_xy) per w1 (each occurrence is a w1
    exactly once), n_uni is the grand total, and the bigram counts
    are the non-NULL rows.  The previous three-branch formulation
    tokenized the corpus three times (unigram counts, the n_uni
    total, and the pair branch) and paid a second corpus-scale
    shuffle; measured at sf1: 19.3 s -> 5.9 s (3.3x), identical
    output (exceptAll-empty both directions).  The checkpointed
    table is DISTINCT-BIGRAM-TYPE grain — the unfiltered count
    table before the BIGRAM_MIN_COUNT cut, because the unigram
    counts must sum over ALL pair rows.  Bigram types grow with the
    corpus under Heaps' law (sub-linearly, exponent < 1, but NOT
    vocabulary-bounded); measured sizes are in PERF.md round 10
    (sf0.1 / sf1 / sf10 rows).  The trade is deliberate: one
    type-grain checkpoint (3 ints + 2 short strings per row, far
    smaller than the token-occurrence stream it aggregates) buys
    back two corpus-scale tokenize+shuffle passes.  If a future SF
    shows the type table outgrowing executor storage, the
    pre-designed fallback is two aggregations over the un-persisted
    stream (one corpus scan each for unigrams and bigrams — still
    one fewer than the pre-r9 form).  The lift join still
    broadcasts the unigram table."""
    toks = load_table(spark, sf_dir, "documents").select(
        _tokens(F.col("text")).alias("tk")
    )
    stream = toks.where(F.size("tk") >= 1).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 1),
                lambda i: F.struct(
                    F.get("tk", i).alias("w1"),
                    F.get("tk", i + 1).alias("w2"),  # NULL at the boundary
                ),
            )
        ).alias("p")
    )
    bc_all = (
        stream.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .localCheckpoint(eager=True)
    )
    uc = bc_all.groupBy("w1").agg(F.sum("c_xy").alias("c_w"))
    tot = bc_all.agg(F.sum("c_xy").alias("n_uni"))
    bc = bc_all.where(
        F.col("w2").isNotNull() & (F.col("c_xy") >= BIGRAM_MIN_COUNT)
    )
    u1 = uc.select(F.col("w1"), F.col("c_w").alias("c_w1"))
    u2 = uc.select(F.col("w1").alias("w2"), F.col("c_w").alias("c_w2"))
    return (
        bc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                (F.col("c_xy") * F.col("n_uni")).cast("double")
                / F.col("c_w1")
                / F.col("c_w2")
            ).alias("lift"),
        )
    )


TX9_ORACLE = f"""
WITH toks AS (
    SELECT {_sql_tokens('text')} AS tk FROM documents
),
uni AS (SELECT unnest(tk) AS w FROM toks),
uc AS (SELECT w, COUNT(*) AS c_w FROM uni GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_uni FROM uni),
pairs AS (
    SELECT tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2
    FROM toks, unnest(range(1, len(tk))) AS t(i)
    WHERE len(tk) >= 2
),
bc AS (
    SELECT w1, w2, COUNT(*) AS c_xy FROM pairs GROUP BY 1, 2
    HAVING COUNT(*) >= {BIGRAM_MIN_COUNT}
)
SELECT b.w1, b.w2, b.c_xy,
       CAST(b.c_xy * t.n_uni AS DOUBLE) / u1.c_w / u2.c_w AS lift
FROM bc b
CROSS JOIN tot t
JOIN uc u1 ON b.w1 = u1.w
JOIN uc u2 ON b.w2 = u2.w
"""


# -- tx10: TextRank keyword scores (iterative PageRank) ---------------
TR_ITERS = 5
TR_SCALE = 1_000_000  # fixed-point micro-units
TR_BASE = 150_000  # (1 - d) * SCALE with damping d = 0.85
TR_D_NUM, TR_D_DEN = 85, 100


def tx10_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level TextRank: PageRank over the word-adjacency graph
    (undirected edges between words that appear next to each other in
    any document), TR_ITERS fixed Jacobi iterations with damping
    0.85 — the classic graph keyword scorer.

    Determinism (the sim4 k-means trick applied to PageRank): scores
    are int64 micro-units and every update is integer arithmetic —
    contribution = pr div deg, update = BASE + (85 * sum) div 100 —
    so an inherently iterative float algorithm becomes bitwise
    reproducible on both engines and the oracle can unroll the same
    five iterations as plain CTEs.  Integer division truncates toward
    zero identically (all values non-negative).

    Scale: the graph is vocabulary-sized (orders of magnitude smaller
    than the corpus); edges+degrees build once and checkpoint, then
    each iteration is one hash join (ranks are re-keyed by word) and
    one map-side-combinable SUM — the standard distributed PageRank
    round.  Per-round eager localCheckpoints keep the plan
    constant-size (dd7's lesson: Catalyst analysis itself blows up on
    an unrolled 5-deep self-referencing plan) and release via
    ContextCleaner."""
    toks = load_table(spark, sf_dir, "documents").select(
        _tokens(F.col("text")).alias("tk")
    )  # re-derived per consumer on purpose — see tx9's note
    nodes = (
        toks.select(F.explode("tk").alias("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bp = (
        toks.where(F.size("tk") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.struct(
                        F.element_at("tk", i).alias("w1"),
                        F.element_at("tk", i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .where(F.col("w1") != F.col("w2"))
        .distinct()
    )
    edges = (
        bp.select(F.col("w1").alias("u"), F.col("w2").alias("v"))
        .unionByName(bp.select(F.col("w2").alias("u"), F.col("w1").alias("v")))
        .distinct()
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # (v, u, deg(v)): static per-iteration join input, built once.
    ev = edges.join(
        deg.select(F.col("u").alias("v"), "deg"), "v"
    ).localCheckpoint(eager=True)
    ranks = nodes.select(
        "w", F.lit(TR_SCALE).cast("long").alias("pr")
    ).localCheckpoint(eager=True)
    # The rounds join/aggregate VOCABULARY-sized frames (the corpus
    # tokenize behind nodes/ev already materialized above, under the
    # session partitioning); right-size the loop's shuffles to that
    # cardinality — dd7's measured lesson that near-empty tasks cost
    # more than graph rounds this small.  No-op once the graph is
    # big enough for the session setting.
    shuffle_conf = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(shuffle_conf)
    parts = max(4, min(int(prev_parts), ranks.count() // 2_000_000 + 1))
    spark.conf.set(shuffle_conf, str(parts))
    try:
        for _ in range(TR_ITERS):
            sums = (
                ev.join(ranks, ev["v"] == ranks["w"])
                .select("u", F.expr("pr div deg").alias("c"))
                .groupBy("u")
                .agg(F.sum("c").alias("s"))
            )
            ranks = (
                nodes.join(sums, nodes["w"] == sums["u"], "left")
                .select(
                    "w",
                    (
                        F.lit(TR_BASE)
                        + F.expr(f"({TR_D_NUM} * coalesce(s, 0)) div {TR_D_DEN}")
                    )
                    .cast("long")
                    .alias("pr"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks
    finally:
        spark.conf.set(shuffle_conf, prev_parts)


def _tx10_oracle() -> str:
    prelude = f"""
WITH toks AS (
    SELECT {_sql_tokens('text')} AS tk FROM documents
),
uni AS (SELECT DISTINCT unnest(tk) AS w FROM toks),
bp AS (
    SELECT DISTINCT tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2
    FROM toks, unnest(range(1, len(tk))) AS t(i)
    WHERE len(tk) >= 2 AND tk[CAST(i AS INT)] <> tk[CAST(i AS INT) + 1]
),
edges AS (SELECT w1 AS u, w2 AS v FROM bp UNION SELECT w2, w1 FROM bp),
deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY 1),
r0 AS (SELECT w, CAST({TR_SCALE} AS BIGINT) AS pr FROM uni)"""
    its = "".join(
        f""",
r{k} AS (
    SELECT n.w,
           CAST({TR_BASE} + ({TR_D_NUM} * COALESCE(s.s, 0)) // {TR_D_DEN}
                AS BIGINT) AS pr
    FROM uni n LEFT JOIN (
        SELECT e.u, SUM(r.pr // d.deg) AS s
        FROM edges e
        JOIN r{k - 1} r ON e.v = r.w
        JOIN deg d ON e.v = d.u
        GROUP BY 1
    ) s ON n.w = s.u
)"""
        for k in range(1, TR_ITERS + 1)
    )
    return prelude + its + f"\nSELECT w, pr FROM r{TR_ITERS}\n"


TX10_ORACLE = _tx10_oracle()


# -- tx11: vocabulary statistics per source ---------------------------
def tx11_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus vocabulary profile: token count, type count
    (distinct words), hapax count (words seen exactly once in that
    source), type-token ratio and hapax share — the lexical-diversity
    fingerprint that separates template/boilerplate sources (low TTR)
    from organic text, and the Heaps'-law input for vocabulary-growth
    monitoring as a corpus scales.

    Scale: one explode + (source, word) count (map-side combinable;
    bounded by |sources| x vocab), then a per-source fold.  Ratios
    are single exact-int divisions."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select("source", F.explode(_tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return wc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        (F.count(F.lit(1)).cast("double") / F.sum("c")).alias("ttr"),
        (
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("hapax_share"),
    )


TX11_ORACLE = f"""
WITH wc AS (
    SELECT source, w, COUNT(*) AS c
    FROM (
        SELECT source, unnest({_sql_tokens('text')}) AS w FROM documents
    )
    GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(COUNT(*) AS DOUBLE) / SUM(c) AS ttr,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
           AS hapax_share
FROM wc
GROUP BY 1
"""


# -- tx15: PII redaction --------------------------------------------
# Conservative patterns valid in BOTH regex dialects (Java on Spark,
# RE2 on DuckDB): no backrefs, no lookaround, char classes only.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+?[0-9][0-9 ()-]{6,}[0-9]"
PII_EMAIL_TOKEN = "<EMAIL>"
PII_PHONE_TOKEN = "<PHONE>"


def redact_pii(col):
    """Column expression: emails then phones replaced by typed tokens.

    Order matters — the email pattern consumes its digits-bearing
    local part first so the phone pattern cannot bite into an
    address.  Generic operator: the synthetic corpus carries no PII
    (the gate proves cross-engine parity of the plumbing at corpus
    scale); behavior on real PII is pinned by
    tests/test_corpus_properties.py with crafted rows."""
    out = F.regexp_replace(col, PII_EMAIL_RE, PII_EMAIL_TOKEN)
    return F.regexp_replace(out, PII_PHONE_RE, PII_PHONE_TOKEN)


def tx15_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub-and-count over the corpus: per-doc e-mail/phone match
    counts plus an md5 of the redacted text (the gate compares the
    digest, not the full text — the driver hash stays small while
    still certifying every redacted byte).

    Scale: pure column expressions — scan-speed, no shuffle at all
    beyond the sink; the regexes run codegen'd on the JVM."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.md5(redact_pii(F.col("text"))).alias("redacted_md5"),
    )


TX15_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT)
           AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE_RE}')) AS INT)
           AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}',
               '{PII_EMAIL_TOKEN}', 'g'), '{PII_PHONE_RE}',
               '{PII_PHONE_TOKEN}', 'g')) AS redacted_md5
FROM documents
"""


# -- tx16: bigram novelty (LM-free perplexity proxy) ------------------
TX16_COMMON = BIGRAM_MIN_COUNT  # a bigram this frequent is "known"


def tx16_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of a doc's adjacent word pairs
    that are NOT common in the corpus (corpus count < TX16_COMMON) —
    the classic perplexity-style quality signal, built from exact
    integer counts so it needs no log() (not bitwise-portable
    cross-engine) and no trained model.  High novelty = gibberish or
    out-of-domain; low = boilerplate.

    Scale: one explode for the corpus bigram census (map-side
    combinable, vocabulary-bounded output), one explode for the
    per-doc pairs, one hash join pairs->common set on (w1, w2), one
    per-doc count aggregate.  The common-bigram table is
    vocabulary^2-bounded — orders of magnitude smaller than the
    corpus — but is NOT force-broadcast: at web scale it can exceed
    driver memory, so the planner picks broadcast vs shuffle from
    stats (AQE)."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", _tokens(F.col("text")).alias("tk")
    )
    pairs = toks.where(F.size("tk") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.struct(
                    F.element_at("tk", i).alias("w1"),
                    F.element_at("tk", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    # The pair stream feeds BOTH the census and the probe; Catalyst
    # does not dedupe common subplans, so without materialization the
    # tokenize+explode pipeline runs twice over the corpus.  Unlike
    # tx9's raw token ARRAYS (whose materialized size outweighed the
    # re-run — PERF.md §4), exploded (id, w1, w2) rows are compact:
    # checkpointing them cuts tx16 ~2.0 -> ~1.5 s at sf0.1.
    pairs = pairs.localCheckpoint(eager=True)
    common = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= TX16_COMMON)
        .select("w1", "w2", F.lit(1).alias("_known"))
    )
    return (
        pairs.join(common, ["w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("_known").isNull(), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_pairs",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_pairs")).alias(
                "novelty_rate"
            ),
        )
    )


TX16_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_sql_tokens('text')} AS tk FROM documents
),
pairs AS (
    SELECT doc_id, tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2
    FROM toks, unnest(range(1, len(tk))) AS t(i)
    WHERE len(tk) >= 2
),
common AS (
    SELECT w1, w2 FROM pairs GROUP BY 1, 2
    HAVING COUNT(*) >= {TX16_COMMON}
)
SELECT p.doc_id,
       COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN c.w1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       CAST(SUM(CASE WHEN c.w1 IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS novelty_rate
FROM pairs p
LEFT JOIN common c ON p.w1 = c.w1 AND p.w2 = c.w2
GROUP BY 1
"""


# -- tx17: character-class diversity (Gini impurity) ------------------
#
# Alphabet the diversity is measured over; shared constant so the
# Spark expression and the DuckDB oracle are generated from the SAME
# list in the SAME canonical order (functions/hashing.py contract).
TX17_CLASSES = tuple("abcdefghijklmnopqrstuvwxyz") + (" ",)


def tx17_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-class diversity: Gini impurity
    1 - Σ(c_i/n)² over the 27-class distribution (a-z + space) of the
    lowercased text, plus the distinct-class count — the cheap
    gibberish/boilerplate detector next to tx16's bigram novelty
    (aaaaaa... scores ~0, natural prose ~0.93+).

    Gini (Simpson index) is chosen over Shannon entropy DELIBERATELY:
    entropy needs log(), which JVM libm and C libm round differently
    at the last ulp, so it can never hash-match cross-engine; Gini is
    exact integer sufficient statistics (Σc², n²) with ONE IEEE
    division — bitwise portable (the tx16 no-log rule).

    Per-class counts come from length(t) - length(replace(t, ch, ''))
    — 27 fixed string scans, no explode, no shuffle, pure codegen'd
    row expressions running at parquet-scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    lt = docs.select("doc_id", F.lower("text").alias("lt"))
    counts = [
        (F.length("lt") - F.length(F.expr(f"replace(lt, '{ch}', '')"))).alias(
            f"c{i}"
        )
        for i, ch in enumerate(TX17_CLASSES)
    ]
    stage = lt.select("doc_id", *counts)
    cols = [F.col(f"c{i}") for i in range(len(TX17_CLASSES))]
    n = cols[0]
    for c in cols[1:]:
        n = n + c
    sc2 = cols[0] * cols[0]
    for c in cols[1:]:
        sc2 = sc2 + c * c
    ncls = F.when(cols[0] > 0, 1).otherwise(0)
    for c in cols[1:]:
        ncls = ncls + F.when(c > 0, 1).otherwise(0)
    return stage.select(
        "doc_id",
        n.cast("long").alias("n_classified"),
        ncls.cast("long").alias("n_classes"),
        F.when(
            n > 0,
            F.lit(1.0)
            - sc2.cast("double") / (n.cast("double") * n.cast("double")),
        ).alias("char_gini"),
    )


def _tx17_sql() -> str:
    cnt = [
        f"(length(lt) - length(replace(lt, '{ch}', ''))) " f"AS c{i}"
        for i, ch in enumerate(TX17_CLASSES)
    ]
    ids = [f"c{i}" for i in range(len(TX17_CLASSES))]
    n = " + ".join(ids)
    sc2 = " + ".join(f"{c} * {c}" for c in ids)
    ncls = " + ".join(f"(CASE WHEN {c} > 0 THEN 1 ELSE 0 END)" for c in ids)
    return f"""
WITH lt AS (SELECT doc_id, lower(text) AS lt FROM documents),
cnt AS (SELECT doc_id, {", ".join(cnt)} FROM lt)
SELECT doc_id,
       CAST({n} AS BIGINT) AS n_classified,
       CAST({ncls} AS BIGINT) AS n_classes,
       CASE WHEN ({n}) > 0 THEN
           1.0 - CAST({sc2} AS DOUBLE)
               / (CAST({n} AS DOUBLE) * CAST({n} AS DOUBLE))
       END AS char_gini
FROM cnt
"""


TX17_ORACLE = _tx17_sql()


QUERIES = {
    "tx1_token_count": tx1_token_count,
    "tx2_quality_score": tx2_quality_score,
    "tx3_language_id": tx3_language_id,
    "tx4_fingerprint": tx4_fingerprint,
    "tx5_tfidf_top_terms": tx5_tfidf_top_terms,
    "tx6_decontamination": tx6_decontamination,
    "tx7_repetition": tx7_repetition,
    "tx8_chunks": tx8_chunks,
    "tx9_bigram_lift": tx9_bigram_lift,
    "tx10_textrank": tx10_textrank,
    "tx11_vocab_stats": tx11_vocab_stats,
    "tx15_pii_redaction": tx15_pii_redaction,
    "tx16_bigram_novelty": tx16_bigram_novelty,
    "tx17_char_diversity": tx17_char_diversity,
}
ORACLES = {
    "tx1_token_count": TX1_ORACLE,
    "tx2_quality_score": TX2_ORACLE,
    "tx3_language_id": TX3_ORACLE,
    "tx4_fingerprint": TX4_ORACLE,
    "tx5_tfidf_top_terms": TX5_ORACLE,
    "tx6_decontamination": TX6_ORACLE,
    "tx7_repetition": TX7_ORACLE,
    "tx8_chunks": TX8_ORACLE,
    "tx9_bigram_lift": TX9_ORACLE,
    "tx10_textrank": TX10_ORACLE,
    "tx11_vocab_stats": TX11_ORACLE,
    "tx15_pii_redaction": TX15_ORACLE,
    "tx16_bigram_novelty": TX16_ORACLE,
    "tx17_char_diversity": TX17_ORACLE,
}
