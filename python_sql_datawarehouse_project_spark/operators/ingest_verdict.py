"""Composed per-ingest verdict: the "cs2 of ingest" (VERDICT r8 #4).

A 100 TB training pipeline schedules ONE operator per arriving batch,
not three: screen the batch against the benchmark suite, probe the
surviving docs against the existing corpus for near-duplicates, and
decide keep/drop (+ the canonical pointer for drops).  Each seam here
is individually green elsewhere — qa23's Bloom screen, dd11's
asymmetric LSH probe, cs1/cs2's canonical argmax — and the persisted
forms (plans/bloom_index.BloomIndex, plans/dedup_index.DedupIndex) are
pytest-pinned equal to their from-scratch rebuilds.  This gate is the
COMPOSITION: the per-document verdict a scheduler acts on.

  ix1_ingest_verdict  one row per batch document:
      (doc_id, n_grams, n_bloom_hits, n_corpus_dups, canonical_id,
       action in {drop_contaminated, drop_duplicate, keep})

Population roles over `documents` (deterministic, engine-portable):
  benchmark  doc_id % BENCH_MOD == 0        (qa23's convention)
  batch      pmod(md5(doc_id), NEW_MOD)==0, not benchmark (dd11's)
  corpus     everything else

Composition order IS the cost story: the Bloom screen (one pass over
the batch's grams + a ~1 MiB broadcast word table) runs FIRST, so the
band probe — the expensive stage — sees only surviving docs.  A
contaminated doc is never probed; its n_corpus_dups is 0 by
construction, not by lookup.

The canonical pointer for a duplicate is its best corpus match
(max jaccard, ties to the smallest corpus doc_id — a total order, so
both engines pick the same row).  In the persisted path the pointer
then routes through the cluster keep-list (DedupIndex.clusters);
inline, the best match IS the cluster representative the probe can
see, and the equality of persisted-vs-inline candidates is pinned in
tests/test_dedup_index.py.

Scale: the corpus side's grams/sketches/bands are recomputed inline
ONLY because a gate must be a pure function of the input tables — a
deployment reads them from the persisted indexes, making per-ingest
cost proportional to the batch (scripts/bench_ingest_loop.py measures
exactly that loop across decades).  Nothing here shuffles payloads
through the band exchange (ids only, the dd3 lesson), the Bloom word
table is bounded by BLOOM_BITS/32 rows at any benchmark size, and the
verify join re-attaches hash sets by doc_id equi-joins.

Reference anchor: the reference has no ingest-time dedup/decontam
(its idempotency is batch replacement, load_to_bronze.py:590-604);
this is extension surface for the LLM-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import hashing as H
from .approx import bloom_doc_hits, bloom_words
from .dedup import JACCARD_T, _doc_sketches, _sql_band_ctes
from .incremental import _SQL_IS_NEW, _bands, _is_new
from .text import BENCH_MOD, DECON_NGRAM, _doc_grams, _sql_tokens


def ix1_ingest_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    in_batch = ~is_bench & _is_new(F.col("doc_id"))
    in_corpus = ~is_bench & ~_is_new(F.col("doc_id"))

    # -- stage 1: Bloom screen of the batch against the benchmark ----
    # r11 (guide §1.2 "don't compute things you throw away"): grams
    # are consumed ONLY for benchmark docs (the Bloom word table) and
    # batch docs (the screened counts) — the corpus role (~79% of the
    # table: the non-bench, non-batch remainder) fed the tokenize +
    # 8-gram + md5 explode and the checkpoint without a single
    # downstream read.  Restricting the input to the two consumed
    # roles is filter-pushdown the optimizer cannot do for us (the
    # role predicates live above the checkpoint boundary); the
    # downstream `where(is_bench)` / `where(in_batch)` filters are
    # conjunctions with the subset, so every consumed row is
    # unchanged.  Corpus docs still feed `sk` below — the probe needs
    # their sketches, not their grams.
    grams = _doc_grams(docs.where(is_bench | in_batch)).localCheckpoint(
        eager=True
    )
    bench_h = grams.where(is_bench).select("h").distinct()
    batch_grams = grams.where(in_batch)
    screen = bloom_doc_hits(batch_grams, bloom_words(bench_h))
    screened = (
        docs.where(in_batch)
        .select("doc_id")
        .join(screen, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0).cast("long")).alias(
                "n_grams"
            ),
            F.coalesce(F.col("n_bloom_hits"), F.lit(0).cast("long")).alias(
                "n_bloom_hits"
            ),
        )
        .localCheckpoint(eager=True)  # feeds survivors AND the verdict
    )
    survivors = screened.where(F.col("n_bloom_hits") == 0).select("doc_id")

    # -- stage 2: asymmetric near-dup probe, survivors x corpus ------
    sk = _doc_sketches(docs.where(in_batch | in_corpus)).localCheckpoint(
        eager=True
    )
    new_sk = sk.join(survivors, "doc_id", "left_semi")
    old_sk = sk.where(in_corpus)
    cand = (
        _bands(new_sk)
        .select(F.col("doc_id").alias("new_doc_id"), "band", "band_key")
        .join(
            _bands(old_sk).select(
                F.col("doc_id").alias("corpus_doc_id"), "band", "band_key"
            ),
            ["band", "band_key"],
        )
        .select("new_doc_id", "corpus_doc_id")
        .dropDuplicates(["new_doc_id", "corpus_doc_id"])
    )
    verified = (
        cand.join(
            new_sk.select(
                F.col("doc_id").alias("new_doc_id"), F.col("hs").alias("hs_a")
            ),
            "new_doc_id",
        )
        .join(
            old_sk.select(
                F.col("doc_id").alias("corpus_doc_id"),
                F.col("hs").alias("hs_b"),
            ),
            "corpus_doc_id",
        )
        .select(
            "new_doc_id",
            "corpus_doc_id",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("ni"),
            F.size("hs_a").alias("na"),
            F.size("hs_b").alias("nb"),
        )
        .withColumn(
            "jaccard",
            F.col("ni").cast("double")
            / (F.col("na") + F.col("nb") - F.col("ni")),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
    )

    # -- stage 3: keep/drop verdict + canonical pointer ---------------
    # argmax by (jaccard DESC, corpus_doc_id ASC): a struct MAX over
    # (jaccard, -corpus_doc_id) — corpus ids are unique per new doc,
    # so the order is total and both engines pick the same canonical.
    dups = verified.groupBy("new_doc_id").agg(
        F.count(F.lit(1)).alias("n_corpus_dups"),
        F.max(
            F.struct(
                F.col("jaccard").alias("j"),
                (-F.col("corpus_doc_id")).alias("neg_id"),
            )
        ).alias("best"),
    )
    return (
        screened.join(
            dups, screened["doc_id"] == dups["new_doc_id"], "left"
        )
        .select(
            "doc_id",
            "n_grams",
            "n_bloom_hits",
            F.coalesce(F.col("n_corpus_dups"), F.lit(0).cast("long")).alias(
                "n_corpus_dups"
            ),
            F.when(
                F.col("n_bloom_hits") == 0,
                (-F.col("best.neg_id")).cast("long"),
            ).alias("canonical_id"),
            F.when(F.col("n_bloom_hits") > 0, F.lit("drop_contaminated"))
            .when(F.col("n_corpus_dups") > 0, F.lit("drop_duplicate"))
            .otherwise(F.lit("keep"))
            .alias("action"),
        )
    )


IX1_ORACLE = f"""
WITH {_sql_band_ctes()},
batch_docs AS (
    SELECT doc_id FROM documents
    WHERE doc_id % {BENCH_MOD} <> 0 AND ({_SQL_IS_NEW})
),
toks AS (
    SELECT doc_id, {_sql_tokens('text')} AS tk FROM documents
),
grams_all AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(tk) - {DECON_NGRAM - 2}),
        i -> {H.sql_md5_long(
            f"array_to_string(list_slice(tk, i, i + {DECON_NGRAM - 1}), ' ')"
        )}
    ))) AS h
    FROM toks WHERE len(tk) >= {DECON_NGRAM}
),
bench AS (
    SELECT DISTINCT h FROM grams_all WHERE doc_id % {BENCH_MOD} = 0
),
batch_grams AS (
    SELECT g.doc_id, g.h FROM grams_all g
    JOIN batch_docs USING (doc_id)
),
bpos AS (SELECT unnest({H.sql_bloom_positions('h')}) AS pos FROM bench),
bloom AS (
    SELECT pos >> 5 AS w,
           bit_or(CAST(1 AS BIGINT) << CAST(pos & 31 AS INT)) AS word
    FROM bpos GROUP BY 1
),
cpos AS (
    SELECT doc_id, h, unnest({H.sql_bloom_positions('h')}) AS pos
    FROM batch_grams
),
hits AS (
    SELECT doc_id, h,
           SUM(CASE WHEN word IS NOT NULL
                    AND ((word >> CAST(pos & 31 AS INT)) & 1) = 1
                    THEN 1 ELSE 0 END) AS nset
    FROM cpos LEFT JOIN bloom ON (pos >> 5) = w
    GROUP BY 1, 2
),
per_doc AS (
    SELECT doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN nset = {H.BLOOM_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bloom_hits
    FROM hits GROUP BY 1
),
screened AS (
    SELECT d.doc_id,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.n_bloom_hits, 0) AS BIGINT) AS n_bloom_hits
    FROM batch_docs d LEFT JOIN per_doc p USING (doc_id)
),
survivors AS (SELECT doc_id FROM screened WHERE n_bloom_hits = 0),
nb AS (SELECT b.* FROM bands b JOIN survivors USING (doc_id)),
ob AS (
    SELECT b.* FROM bands b
    WHERE b.doc_id % {BENCH_MOD} <> 0
      AND NOT ({_SQL_IS_NEW.replace('doc_id', 'b.doc_id')})
),
cand AS (
    SELECT DISTINCT n.doc_id AS new_doc_id, o.doc_id AS corpus_doc_id,
           n.hs AS hs_a, o.hs AS hs_b
    FROM nb n JOIN ob o ON n.band = o.band AND n.band_key = o.band_key
),
verified AS (
    SELECT new_doc_id, corpus_doc_id,
           CAST(len(list_intersect(hs_a, hs_b)) AS DOUBLE)
             / (len(hs_a) + len(hs_b) - len(list_intersect(hs_a, hs_b)))
               AS jaccard
    FROM cand
    WHERE CAST(len(list_intersect(hs_a, hs_b)) AS DOUBLE)
             / (len(hs_a) + len(hs_b) - len(list_intersect(hs_a, hs_b)))
           >= {JACCARD_T}
),
dups AS (
    SELECT new_doc_id,
           COUNT(*) AS n_corpus_dups,
           first(corpus_doc_id ORDER BY jaccard DESC, corpus_doc_id)
               AS best_id
    FROM verified GROUP BY 1
)
SELECT s.doc_id, s.n_grams, s.n_bloom_hits,
       CAST(COALESCE(d.n_corpus_dups, 0) AS BIGINT) AS n_corpus_dups,
       CASE WHEN s.n_bloom_hits = 0 THEN CAST(d.best_id AS BIGINT) END
           AS canonical_id,
       CASE WHEN s.n_bloom_hits > 0 THEN 'drop_contaminated'
            WHEN d.n_corpus_dups > 0 THEN 'drop_duplicate'
            ELSE 'keep' END AS action
FROM screened s LEFT JOIN dups d ON s.doc_id = d.new_doc_id
"""


QUERIES = {"ix1_ingest_verdict": ix1_ingest_verdict}
ORACLES = {"ix1_ingest_verdict": IX1_ORACLE}


# -- ix2: the embedding-side ingest verdict ---------------------------
def ix2_embedding_ingest_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ix1's composition for the EMBEDDING modality: per new vector,
    (a) SEMANTIC decontamination — near-match against the eval-set
    vectors (vec_id % BENCH_MOD == 0), the screen that catches
    paraphrased/reformatted eval leakage an exact-gram check misses
    entirely; (b) corpus near-dup probe for the survivors; (c)
    keep/drop verdict with a canonical pointer (argmax cosine, ties
    to the smallest corpus vec_id — total order).

      ix2_embedding_ingest_verdict  one row per batch vector:
          (vec_id, n_eval_hits, n_corpus_dups, canonical_id,
           action in {drop_contaminated, drop_duplicate, keep})

    Both probes are ASYMMETRIC banded hyperplane-LSH joins using
    dd14's AUTO-SIZED banding (bits-per-band derived from the corpus
    count so per-bucket occupancy stays constant as the corpus grows
    — dd6's frozen 16-bucket bands would make the probe fan-in
    quadratic at sf10; PERF.md round-6 Diagnosis 1), with dd16's
    OCCUPANCY CAP on the corpus side: buckets over AUTO_OCC keep
    only their hub (min vec_id), because in dense corpora the true
    near-dup clusters stop splitting however many bits are added
    (the dd14 second-decade limit — measured HERE too: the uncapped
    auto-banded probe ran 16.5/34.0/774.7 s across the decades, the
    sf10 wall being exactly that noise-limited fan-in; the capped
    probe's decade rows are in PERF.md round 9).  A new vector
    landing in a mega-bucket still pairs with the bucket's hub, so
    dup DETECTION survives the cap; the count is over capped
    candidates, documented.  Matches verify with the exact
    sequential-fold cosine at COSINE_T (the repo-wide near-dup bar;
    a deployment tunes the two thresholds independently — the screen
    typically higher).  Vectors move only through the rescore's
    vec_id-keyed joins; the band exchange ships (vec_id, band_key)
    longs.

    Scale: the corpus/eval bands are recomputed inline only because a
    gate is a pure function of the input tables — the persisted form
    is plans/emb_index.EmbIngestIndex (round 10: AnnIndex vector
    store + capped corpus bands at rest + frozen band width;
    ingest_verdict pinned == this gate in tests/test_emb_index.py),
    and scripts/bench_emb_ingest_loop.py measures that loop across
    decades (PERF.md round 10).  Oracle embeds dd14's auto-band CTE
    stack (dedup._sql_auto_band_ctes — the band width derived in SQL
    from COUNT(*)) plus the dd16 cap mirrored as occ/hub CTEs, so it
    inherits HEAVY_ORACLE_SF1 (Spark-side decade rows in PERF.md
    round 9)."""
    from .dedup import AUTO_OCC, COSINE_T, _auto_bands, _auto_bits, _normalized

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = _normalized(emb).localCheckpoint(eager=True)
    is_eval = F.col("vec_id") % BENCH_MOD == 0
    in_batch = ~is_eval & _is_new(F.col("vec_id"))
    in_corpus = ~is_eval & ~_is_new(F.col("vec_id"))
    # one bounded driver action picks the band width (dd14's rule);
    # the oracle's meta CTE derives the same value from COUNT(*)
    bands = _auto_bands(n, _auto_bits(n.count())).localCheckpoint(
        eager=True
    )
    # corpus side: dd16's occupancy cap at rest — mega-buckets keep
    # only their hub, bounding the probe fan-in at AUTO_OCC+1 per key
    corp_bands = bands.where(in_corpus)
    occ = corp_bands.groupBy("band_key").agg(
        F.count(F.lit(1)).alias("occ"), F.min("vec_id").alias("hub")
    )
    corp_capped = (
        corp_bands.join(occ, "band_key")
        .where((F.col("occ") <= AUTO_OCC) | (F.col("vec_id") == F.col("hub")))
        .select("vec_id", "band_key")
    )
    eval_bands = bands.where(is_eval)

    def probe(new_ids: DataFrame, other_bands: DataFrame) -> DataFrame:
        """(new_id, other_id, cosine >= COSINE_T) via the asymmetric
        band join + exact fold rescore."""
        cand = (
            bands.join(new_ids, "vec_id", "left_semi")
            .select(F.col("vec_id").alias("new_id"), "band_key")
            .join(
                other_bands.select(
                    F.col("vec_id").alias("other_id"), "band_key"
                ),
                "band_key",
            )
            .select("new_id", "other_id")
            .dropDuplicates(["new_id", "other_id"])
        )
        a = n.select(F.col("vec_id").alias("new_id"), F.col("vn").alias("va"))
        b = n.select(
            F.col("vec_id").alias("other_id"), F.col("vn").alias("vb")
        )
        d = H.dot_fold(F.col("va"), F.col("vb"))
        return (
            cand.join(a, "new_id")
            .join(b, "other_id")
            .filter(d >= COSINE_T)
            .select("new_id", "other_id", d.alias("cosine"))
        )

    batch_ids = n.where(in_batch).select("vec_id")
    eval_hits = (
        probe(batch_ids, eval_bands)
        .groupBy("new_id")
        .agg(F.count(F.lit(1)).alias("n_eval_hits"))
    )
    screened = (
        batch_ids.join(
            eval_hits, batch_ids["vec_id"] == eval_hits["new_id"], "left"
        )
        .select(
            "vec_id",
            F.coalesce(F.col("n_eval_hits"), F.lit(0).cast("long")).alias(
                "n_eval_hits"
            ),
        )
        .localCheckpoint(eager=True)  # feeds survivors AND the verdict
    )
    survivors = screened.where(F.col("n_eval_hits") == 0).select("vec_id")
    dups = (
        probe(survivors, corp_capped)
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).alias("n_corpus_dups"),
            F.max(
                F.struct(
                    F.col("cosine").alias("c"),
                    (-F.col("other_id")).alias("neg_id"),
                )
            ).alias("best"),
        )
    )
    return (
        screened.join(dups, screened["vec_id"] == dups["new_id"], "left")
        .select(
            "vec_id",
            "n_eval_hits",
            F.coalesce(F.col("n_corpus_dups"), F.lit(0).cast("long")).alias(
                "n_corpus_dups"
            ),
            F.when(
                F.col("n_eval_hits") == 0,
                (-F.col("best.neg_id")).cast("long"),
            ).alias("canonical_id"),
            F.when(F.col("n_eval_hits") > 0, F.lit("drop_contaminated"))
            .when(F.col("n_corpus_dups") > 0, F.lit("drop_duplicate"))
            .otherwise(F.lit("keep"))
            .alias("action"),
        )
    )


def _ix2_oracle() -> str:
    from .dedup import AUTO_OCC, COSINE_T, _sql_auto_band_ctes

    is_new_vec = _SQL_IS_NEW.replace("doc_id", "vec_id")
    return f"""
WITH {_sql_auto_band_ctes()},
batch_vecs AS (
    SELECT vec_id FROM embeddings
    WHERE vec_id % {BENCH_MOD} <> 0 AND ({is_new_vec})
),
nb AS (SELECT b.* FROM bands b JOIN batch_vecs USING (vec_id)),
evb AS (SELECT * FROM bands WHERE vec_id % {BENCH_MOD} = 0),
ecand AS (
    SELECT DISTINCT n.vec_id AS new_id, e.vec_id AS other_id
    FROM nb n JOIN evb e ON n.band_key = e.band_key
),
ehits AS (
    SELECT new_id, COUNT(*) AS n_eval_hits
    FROM ecand
    JOIN normalized a ON ecand.new_id = a.vec_id
    JOIN normalized b ON ecand.other_id = b.vec_id
    WHERE {H.sql_dot('a.vn', 'b.vn')} >= {COSINE_T}
    GROUP BY 1
),
screened AS (
    SELECT d.vec_id,
           CAST(COALESCE(e.n_eval_hits, 0) AS BIGINT) AS n_eval_hits
    FROM batch_vecs d LEFT JOIN ehits e ON d.vec_id = e.new_id
),
survivors AS (SELECT vec_id FROM screened WHERE n_eval_hits = 0),
sb AS (SELECT b.* FROM bands b JOIN survivors USING (vec_id)),
cb AS (
    SELECT * FROM bands
    WHERE vec_id % {BENCH_MOD} <> 0
      AND NOT ({is_new_vec})
),
cbo AS (
    SELECT band_key, COUNT(*) AS occ, MIN(vec_id) AS hub
    FROM cb GROUP BY 1
),
cbc AS (
    SELECT cb.vec_id, cb.band_key FROM cb JOIN cbo USING (band_key)
    WHERE cbo.occ <= {AUTO_OCC} OR cb.vec_id = cbo.hub
),
ccand AS (
    SELECT DISTINCT s.vec_id AS new_id, c.vec_id AS other_id
    FROM sb s JOIN cbc c ON s.band_key = c.band_key
),
cmatch AS (
    SELECT new_id, other_id, {H.sql_dot('a.vn', 'b.vn')} AS cosine
    FROM ccand
    JOIN normalized a ON ccand.new_id = a.vec_id
    JOIN normalized b ON ccand.other_id = b.vec_id
    WHERE {H.sql_dot('a.vn', 'b.vn')} >= {COSINE_T}
),
dups AS (
    SELECT new_id, COUNT(*) AS n_corpus_dups,
           first(other_id ORDER BY cosine DESC, other_id) AS best_id
    FROM cmatch GROUP BY 1
)
SELECT s.vec_id, s.n_eval_hits,
       CAST(COALESCE(d.n_corpus_dups, 0) AS BIGINT) AS n_corpus_dups,
       CASE WHEN s.n_eval_hits = 0 THEN CAST(d.best_id AS BIGINT) END
           AS canonical_id,
       CASE WHEN s.n_eval_hits > 0 THEN 'drop_contaminated'
            WHEN d.n_corpus_dups > 0 THEN 'drop_duplicate'
            ELSE 'keep' END AS action
FROM screened s LEFT JOIN dups d ON s.vec_id = d.new_id
"""


QUERIES["ix2_embedding_ingest_verdict"] = ix2_embedding_ingest_verdict
ORACLES["ix2_embedding_ingest_verdict"] = _ix2_oracle()
