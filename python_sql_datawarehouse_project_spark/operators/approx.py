"""Approximate/streaming-summary operators that a 100 TB pipeline
runs where the exact answer is either unnecessary (distinct counts,
weighted samples) or unaffordable as a single exact pass (frequent
items over an open key domain).  Beyond the reference's own surface
(BASELINE.json north star) — the reference has no sketching; its
closest analogue is the exact COUNT(DISTINCT) quality probes
(quality_checks_gold.sql:20-30), which these operators generalize to
mergeable, pre-aggregable forms.

Three operators, one correctness contract each:

  qa22_hll_distinct     explicit HyperLogLog registers (m=64) per
                        event_type, PLUS the merged global sketch
                        computed from the per-group registers alone —
                        the mergeability exhibit.  Completes the
                        mergeable-sketch trio: KMV (qa4, order
                        statistics), CMS (qa9, counter array), HLL
                        (register max).
  ds9_priority_sample   Duffield-Lund-Thorup priority sampling: the
                        weighted without-replacement sample with an
                        unbiased subset-sum estimator (w_hat =
                        max(w, tau)).  The principled way to draw a
                        quality-weighted training-data subsample
                        whose token totals remain estimable.
  hh1_frequent_items    distributed Misra-Gries candidate pruning +
                        exact recount: items with support >= 1/64,
                        EXACT output from bounded per-partition
                        state.  The groupBy touches only candidate
                        rows — at 100 TB the full per-key groupBy
                        this replaces is the cost ceiling.

Cross-engine determinism (the whole design problem for oracled
sketches — see functions/hashing.py's portability contract):

  * All hashes are md5_long (identical 60-bit value both engines).
  * HLL's harmonic mean is computed in SCALED INTEGERS: each
    register contributes 2^(55 - M_j) as an int64 (max 64 * 2^55 =
    2^61), so the only float op is ONE literal/int64 division —
    correctly rounded identically on both engines.  A float
    sum(2^-M_j) would be accumulation-order-dependent.
  * Priority q_i = w_i * 2^60 / h_i is two IEEE double ops on exact
    inputs with an identical expression tree both sides; ranking and
    tau are order statistics of those identical doubles.
  * Misra-Gries summaries are ORDER-DEPENDENT (batch order inside a
    partition), so they can never be oracled directly — the gate's
    output is the exact RECOUNT of the candidate union, which is
    order-independent because the MG guarantee (undercount <=
    N/(cap+1) < support threshold) makes candidates a superset of
    every qualifying key regardless of arrival order.

Scale notes: qa22's shuffle state is |groups| * 64 register rows
(map-side combined); ds9's top-(k+1) is a TakeOrdered (per-partition
heap, k+1 rows cross the wire per partition) with the rank/tau window
over a (k+1)-row frame; hh1's Python stage is one Arrow mapInPandas
pass with a 127-entry dict per partition — constant memory at any
scale — and the exact recount shuffles only rows whose key is in the
broadcast candidate set.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import hashing as H
from .text import BENCH_MOD, DECON_NGRAM, _doc_grams, _sql_tokens

# -- qa22: HyperLogLog distinct sketch --------------------------------
HLL_P = 6                      # register index bits
HLL_M = 1 << HLL_P             # 64 registers
HLL_REM_BITS = 60 - HLL_P      # 54 hash bits feed the rank
HLL_RMAX = HLL_REM_BITS + 1    # rho in [1, 55]; 0 = empty register
# alpha_64 = 0.709 (Flajolet et al. 2007, m=64 constant).  The whole
# numerator is folded into ONE Python float literal emitted to both
# engines, so est = LITERAL / double(z) is a single division.
HLL_ALPHA_NUM = 0.709 * float(HLL_M * HLL_M) * float(1 << HLL_RMAX)


def qa22_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type HLL sketches of distinct user_id, merged into a
    global 'ALL' sketch via register-wise MAX of the per-group
    registers (never rescanning the data) — the property that makes
    HLL the warehouse distinct-count primitive: per-partition /
    per-day / per-source sketches union losslessly.

    rho (first-1-bit position of the 54 post-index bits) is computed
    portably as 55 - length(bin(rem)) — both engines' bin() renders
    positive integers without leading zeros — with rem = 0 mapped to
    the conventional width+1.  Exact truth per group rides along as
    the estimate-quality exhibit (qa4's KMV contract).

    The output is the RAW estimator alpha * m^2 / sum(2^-M_j); the
    small-range LinearCounting correction (m * ln(m / n_zero) when
    est <= 2.5m) is deliberately NOT applied in the oracled columns —
    ln is transcendental and not bitwise cross-engine portable — but
    n_zero is carried precisely so a consumer (or the property test)
    applies it as a scalar post-step on the sketch row.

    Scale: the expensive pass reduces to |groups| * 64 register rows
    via a map-side-combined (group, reg) MAX; everything after runs
    on that sketch table.  The exact-truth branch exists only for the
    exhibit — a production run drops it, which is the point."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        H.md5_long(F.col("user_id").cast("string")).alias("h"),
    )
    rem = F.shiftright(F.col("h"), HLL_P)
    rho = F.when(rem == 0, F.lit(HLL_RMAX)).otherwise(
        F.lit(HLL_RMAX) - F.length(F.bin(rem))
    )
    per_reg = (
        ev.select(
            "event_type",
            (F.col("h") % HLL_M).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m"))
    )
    merged = (
        per_reg.groupBy("reg")
        .agg(F.max("m").alias("m"))
        .select(F.lit("ALL").alias("event_type"), "reg", "m")
    )
    sketches = per_reg.unionByName(merged)
    # Dense 64-register frame per group (empty registers count as
    # m = 0 in the harmonic mean): |groups| x 64 rows, broadcast side.
    frame = (
        sketches.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("reg"),
        )
    )
    dense = frame.join(sketches, ["event_type", "reg"], "left").select(
        "event_type", "reg", F.coalesce(F.col("m"), F.lit(0)).alias("m")
    )
    z = dense.groupBy("event_type").agg(
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_RMAX} - m AS INT))"
            )
        ).alias("z_scaled"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
    )
    truth = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("true_distinct"))
        .unionByName(
            load_table(spark, sf_dir, "events").agg(
                F.countDistinct("user_id").alias("true_distinct")
            ).select(F.lit("ALL").alias("event_type"), "true_distinct")
        )
    )
    return z.join(truth, "event_type").select(
        "event_type",
        "n_zero",
        "z_scaled",
        (F.lit(HLL_ALPHA_NUM) / F.col("z_scaled").cast("double")).alias(
            "est_distinct"
        ),
        "true_distinct",
    )


QA22_ORACLE = f"""
WITH ev AS (
    SELECT event_type,
           {H.sql_md5_long("CAST(user_id AS VARCHAR)")} AS h
    FROM events
),
rr AS (
    SELECT event_type, h % {HLL_M} AS reg,
           CASE WHEN h // {HLL_M} = 0 THEN {HLL_RMAX}
                ELSE {HLL_RMAX} - length(bin(h // {HLL_M})) END AS rho
    FROM ev
),
pr AS (SELECT event_type, reg, MAX(rho) AS m FROM rr GROUP BY 1, 2),
mr AS (SELECT 'ALL' AS event_type, reg, MAX(m) AS m FROM pr GROUP BY 2),
sk AS (SELECT * FROM pr UNION ALL SELECT * FROM mr),
frame AS (
    SELECT g.event_type, r.reg
    FROM (SELECT DISTINCT event_type FROM sk) g,
         (SELECT unnest(range(0, {HLL_M})) AS reg) r
),
dense AS (
    SELECT f.event_type, f.reg, COALESCE(sk.m, 0) AS m
    FROM frame f LEFT JOIN sk ON f.event_type = sk.event_type
                             AND f.reg = sk.reg
),
z AS (
    SELECT event_type,
           CAST(SUM(CAST(1 AS BIGINT) << CAST({HLL_RMAX} - m AS INT))
                AS BIGINT) AS z_scaled,
           CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero
    FROM dense GROUP BY 1
),
truth AS (
    SELECT event_type, COUNT(DISTINCT user_id) AS true_distinct
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', COUNT(DISTINCT user_id) FROM events
)
SELECT z.event_type, n_zero, z_scaled,
       {HLL_ALPHA_NUM!r} / CAST(z_scaled AS DOUBLE) AS est_distinct,
       true_distinct
FROM z JOIN truth ON z.event_type = truth.event_type
"""

# -- ds9: priority sampling (weighted, without replacement) -----------
PS_K = 64


def ds9_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sample of PS_K documents weighted by n_chars
    (Duffield/Lund/Thorup: priority q_i = w_i / u_i with u_i uniform
    from the doc hash; keep the top k; tau = (k+1)-th priority;
    w_hat_i = max(w_i, tau) is the unbiased subset-sum estimator).
    The training-data use: draw a character-budget-weighted subsample
    of a corpus such that any slice's total size can still be
    estimated unbiasedly from the sample alone.

    Determinism: u_i = h_i / 2^60 folded into q_i = w_i * 2^60 / h_i.
    The 60-bit hash h is NOT exactly representable as a double (53-bit
    mantissa); parity holds because both engines perform the identical
    IEEE round-to-nearest int64->double conversion and evaluate the
    identical expression tree, so every intermediate double — and
    therefore every rank and tau — is bit-equal anyway.  Sample
    membership is totally ordered by (priority DESC, doc_id) so a
    boundary tie is deterministic.

    Scale: the top-(k+1) is TakeOrdered — a k+1-row heap per
    partition, k+1 rows per partition over the wire, no full sort.
    The rank/tau window then runs on a (k+1)-row frame (audited
    single-partition allowlist class (b): bounded by k, never by
    data)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("double").alias("w"),
        H.md5_long(F.concat(F.lit("ps:"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    )
    pri = docs.select(
        "doc_id",
        "w",
        (F.col("w") * F.lit(float(1 << 60)) / F.col("h").cast("double")).alias(
            "priority"
        ),
    )
    top = pri.orderBy(F.desc("priority"), "doc_id").limit(PS_K + 1)
    wnd = Window.orderBy(F.desc("priority"), "doc_id")
    # tau = the (k+1)-th priority; 0.0 when the corpus has <= k docs
    # (then the "sample" is exhaustive and w_hat = w exactly).
    ranked = top.withColumn("rk", F.row_number().over(wnd)).withColumn(
        "tau",
        F.coalesce(
            F.max(F.when(F.col("rk") == PS_K + 1, F.col("priority"))).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
            F.lit(0.0),
        ),
    )
    return (
        ranked.where(F.col("rk") <= PS_K)
        .select(
            "doc_id",
            "w",
            "priority",
            "tau",
            F.greatest(F.col("w"), F.col("tau")).alias("w_hat"),
        )
    )


DS9_ORACLE = f"""
WITH d AS (
    SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
           {H.sql_md5_long("'ps:' || CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
),
p AS (
    SELECT doc_id, w,
           w * {float(1 << 60)!r} / CAST(h AS DOUBLE) AS priority
    FROM d
),
r AS (
    SELECT doc_id, w, priority,
           ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rk
    FROM p
),
tau AS (
    SELECT COALESCE(MAX(CASE WHEN rk = {PS_K + 1} THEN priority END), 0.0)
           AS tau
    FROM r WHERE rk <= {PS_K + 1}
)
SELECT doc_id, w, priority, tau.tau AS tau,
       GREATEST(w, tau.tau) AS w_hat
FROM r, tau
WHERE rk <= {PS_K}
"""

# -- ds10: per-stratum priority sampling -------------------------------
PS10_K = 16


def ds10_stratified_priority_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ds9's priority sampling applied PER STRATUM (documents.source):
    top-PS10_K docs per source by the same w*2^60/h priority, each
    stratum carrying its own tau (the (k+1)-th priority WITHIN the
    stratum) and w_hat = max(w, tau) estimator — the quota shape a
    training-mix pipeline actually runs ("n docs per domain/language,
    with per-domain size totals still estimable from the sample").

    Same determinism argument as ds9 (shared hash salt, so the same
    doc gets the same priority in both gates).  Scale: one
    partitionBy(source) window — grouped top-k with NO global
    exchange; stratum count grows with the corpus, parallelism
    follows."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("double").alias("w"),
        H.md5_long(F.concat(F.lit("ps:"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    )
    pri = docs.select(
        "doc_id",
        "source",
        "w",
        (F.col("w") * F.lit(float(1 << 60)) / F.col("h").cast("double")).alias(
            "priority"
        ),
    )
    wnd = Window.partitionBy("source").orderBy(F.desc("priority"), "doc_id")
    grp = Window.partitionBy("source")
    ranked = pri.withColumn("rk", F.row_number().over(wnd)).withColumn(
        "tau",
        F.coalesce(
            F.max(F.when(F.col("rk") == PS10_K + 1, F.col("priority"))).over(
                grp
            ),
            F.lit(0.0),
        ),
    )
    return ranked.where(F.col("rk") <= PS10_K).select(
        "source",
        "doc_id",
        "w",
        "priority",
        "tau",
        F.greatest(F.col("w"), F.col("tau")).alias("w_hat"),
    )


DS10_ORACLE = f"""
WITH d AS (
    SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS w,
           {H.sql_md5_long("'ps:' || CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
),
p AS (
    SELECT doc_id, source, w,
           w * {float(1 << 60)!r} / CAST(h AS DOUBLE) AS priority
    FROM d
),
r AS (
    SELECT doc_id, source, w, priority,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY priority DESC, doc_id) AS rk
    FROM p
),
t AS (
    SELECT source, doc_id, w, priority, rk,
           COALESCE(MAX(CASE WHEN rk = {PS10_K + 1} THEN priority END)
                    OVER (PARTITION BY source), 0.0) AS tau
    FROM r
)
SELECT source, doc_id, w, priority, tau,
       GREATEST(w, tau) AS w_hat
FROM t
WHERE rk <= {PS10_K}
"""

# -- hh1: frequent items via distributed Misra-Gries ------------------
# Support threshold 1/HH_DEN of the stream; MG capacity HH_CAP
# guarantees union undercount < N/(HH_CAP+1) <= N/HH_DEN/2, so every
# qualifying key survives in at least one partition summary at ANY
# data scale — capacity is a CONSTANT, not a function of N.
HH_DEN = 64
HH_CAP = 127
# The synthetic events table is near-uniform in user_id; fold 20% of
# users (user_id % 5 == 0) onto 7 hot keys so the stream has true
# heavy hitters at every SF.  Negative key range can't collide with
# real user ids.
_HH_KEY_SQL = (
    "CASE WHEN user_id % 5 = 0 THEN -(user_id % 7) - 1 ELSE user_id END"
)


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra-Gries summary of one partition: at most HH_CAP keys whose
    MG counters survived.  Implemented as the MERGEABLE-SUMMARIES
    form (Agarwal et al., PODS'12): each Arrow batch's exact
    value_counts (vectorized, no Python row loop) merges into the
    running summary by counter addition; overflow subtracts the
    (cap+1)-th largest counter from every key and prunes non-positive
    ones — the merge that keeps total undercount <= n_partition /
    (HH_CAP + 1) regardless of batch boundaries or row order."""
    counters: dict[int, int] = {}
    for pdf in batches:
        for k, c in pdf["k"].value_counts().items():
            k = int(k)
            counters[k] = counters.get(k, 0) + int(c)
        if len(counters) > HH_CAP:
            vals = sorted(counters.values(), reverse=True)
            sub = vals[HH_CAP]
            counters = {k: c - sub for k, c in counters.items() if c > sub}
    if counters:
        yield pd.DataFrame({"k": list(counters.keys())})


def hh1_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-items: every derived key with support >= 1/64
    of the event stream, found WITHOUT a full per-key aggregation.

    Two phases: (1) one Arrow mapInPandas pass runs a 127-entry
    Misra-Gries summary per partition (constant memory per task at
    any scale); the union of surviving keys is a guaranteed SUPERSET
    of every key with support >= 1/64 regardless of row order, since
    the total undercount is < N/128.  (2) the exact recount GROUPs
    ONLY rows whose key is in the broadcast candidate set (<=
    127 * partitions keys), then filters by the exact integer support
    test exact_n * 64 >= N.  The oracle is the plain exact GROUP
    BY/HAVING — the MG stage affects only WHICH keys get recounted,
    never the result, which is what makes an order-dependent sketch
    oracle-able.

    Scale: phase 1 streams Arrow batches through a bounded dict;
    phase 2's shuffle carries only candidate-key rows (the 100 TB
    win: the open user-id domain never shuffles)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(_HH_KEY_SQL).cast("long").alias("k")
    )
    cands = (
        ev.mapInPandas(_mg_candidates, "k long")
        .distinct()
    )
    total = ev.agg(F.count(F.lit(1)).alias("n"))
    return (
        ev.join(F.broadcast(cands), "k", "leftsemi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("exact_n") * HH_DEN >= F.col("n"))
        .select("k", "exact_n", "n")
    )


HH1_ORACLE = f"""
WITH ev AS (SELECT {_HH_KEY_SQL} AS k FROM events),
t AS (SELECT COUNT(*) AS n FROM ev),
c AS (SELECT k, COUNT(*) AS exact_n FROM ev GROUP BY 1)
SELECT k, exact_n, t.n AS n
FROM c, t
WHERE exact_n * {HH_DEN} >= t.n
"""


# -- qa23: Bloom-filter membership (decontamination at scale) ---------
def _bloom_word(pos):
    return F.shiftright(pos, 5)


def _bloom_mask(pos):
    # pyspark's shiftleft() takes only a LITERAL bit count, so the
    # variable mask 1<<(pos&31) is a 32-entry literal lookup instead
    # (constant-folded; element_at is 1-indexed).  Built per call, not
    # at module scope: F.lit needs an active SparkContext.
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])
    return F.element_at(
        masks, pos.bitwiseAND(F.lit(31)).cast("int") + F.lit(1)
    )


def bloom_words(keys: DataFrame) -> DataFrame:
    """(w, word): the packed Bloom array of `keys`' column h —
    <= BLOOM_BITS/32 rows at any input size, OR-mergeable with any
    other bloom_words frame by groupBy(w).bit_or(word)."""
    return (
        keys.select(F.explode(H.bloom_positions(F.col("h"))).alias("pos"))
        .select(
            _bloom_word(F.col("pos")).alias("w"),
            _bloom_mask(F.col("pos")).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
    )


def bloom_doc_hits(grams: DataFrame, words: DataFrame) -> DataFrame:
    """(doc_id, n_grams, n_bloom_hits) for a (doc_id, h) gram stream
    probed against a bloom_words frame (broadcast: the word table is
    bounded by BLOOM_BITS/32 regardless of what built it)."""
    probe = (
        grams.select(
            "doc_id", "h",
            F.explode(H.bloom_positions(F.col("h"))).alias("pos"),
        )
        .withColumn("w", _bloom_word(F.col("pos")))
        .join(F.broadcast(words), "w", "left")
        .select(
            "doc_id", "h",
            F.when(
                F.col("word").isNotNull()
                & (
                    F.col("word").bitwiseAND(_bloom_mask(F.col("pos")))
                    != F.lit(0)
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("hit"),
        )
        .groupBy("doc_id", "h")
        .agg(F.sum("hit").alias("nset"))
    )
    return probe.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(
            F.when(F.col("nset") == H.BLOOM_K, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_bloom_hits"),
    )


def qa23_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a Bloom filter — the
    constant-size twin of tx6's exact gram join, completing the
    mergeable-sketch family with the membership sketch (KMV qa4 /
    CMS qa9 / HLL qa22 / MG hh1 / priority ds9).

    tx6 semi-joins the corpus gram stream against the benchmark gram
    SET — a shuffle whose build side grows with the eval suite.  Here
    the benchmark collapses into a fixed BLOOM_BITS-bit array
    (2^22 bits = 128 Ki packed-int64 words ~ 1 MiB): per gram,
    BLOOM_K md5-derived positions OR into 32-bit-packed words via a
    map-side-combined bit_or aggregation (mergeable: partition /
    day / source blooms union with OR, same contract as the HLL
    register MAX).  The probe is then a BROADCAST join of the word
    table against the corpus positions — no shuffle grows with the
    benchmark, ever.  A membership FP rate rides along measurably:
    the exact overlap count (tx6's join, broadcast-sized at these
    SFs) is carried per doc, so n_bloom_hits - n_exact_hits IS the
    observed false-positive mass — the gate self-audits the sketch
    against ground truth the same way qa22 carries exact_distinct.

    Cross-engine: positions and masks are exact int64 arithmetic
    (functions/hashing.py BLOOM_* notes — 32-bit packing because
    DuckDB range-checks BIGINT `<<`), counts are longs, the single
    double is one division.  Scale: explode factor is BLOOM_K per
    distinct gram; both aggregations map-side combine on compact
    longs; the bloom table is bounded by BLOOM_BITS/32 rows at ANY
    corpus/benchmark size."""
    g = _doc_grams(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )
    corp = g.where(F.col("doc_id") % BENCH_MOD != 0)
    bench = g.where(F.col("doc_id") % BENCH_MOD == 0).select("h").distinct()
    per_doc = bloom_doc_hits(corp, bloom_words(bench))
    exact = (
        corp.join(bench, "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact_hits"))
    )
    return (
        per_doc.join(exact, "doc_id", "left")
        .where(F.col("n_bloom_hits") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_bloom_hits",
            F.coalesce(F.col("n_exact_hits"), F.lit(0).cast("long")).alias(
                "n_exact_hits"
            ),
            (
                F.col("n_bloom_hits").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("bloom_rate"),
        )
    )


QA23_ORACLE = f"""
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
bench AS (SELECT DISTINCT h FROM grams WHERE doc_id % {BENCH_MOD} = 0),
bpos AS (
    SELECT unnest({H.sql_bloom_positions('h')}) AS pos FROM bench
),
bloom AS (
    SELECT pos >> 5 AS w,
           bit_or(CAST(1 AS BIGINT) << CAST(pos & 31 AS INT)) AS word
    FROM bpos GROUP BY 1
),
cpos AS (
    SELECT doc_id, h, unnest({H.sql_bloom_positions('h')}) AS pos
    FROM corp
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
exact AS (
    SELECT doc_id, COUNT(*) AS n_exact_hits
    FROM corp JOIN bench USING (h) GROUP BY 1
)
SELECT p.doc_id, n_grams, n_bloom_hits,
       COALESCE(n_exact_hits, CAST(0 AS BIGINT)) AS n_exact_hits,
       CAST(n_bloom_hits AS DOUBLE) / CAST(n_grams AS DOUBLE)
           AS bloom_rate
FROM per_doc p LEFT JOIN exact USING (doc_id)
WHERE n_bloom_hits > 0
"""


QUERIES = {
    "qa22_hll_distinct": qa22_hll_distinct,
    "qa23_bloom_decontam": qa23_bloom_decontam,
    "ds9_priority_sample": ds9_priority_sample,
    "ds10_stratified_priority_sample": ds10_stratified_priority_sample,
    "hh1_frequent_items": hh1_frequent_items,
}
ORACLES = {
    "qa22_hll_distinct": QA22_ORACLE,
    "qa23_bloom_decontam": QA23_ORACLE,
    "ds9_priority_sample": DS9_ORACLE,
    "ds10_stratified_priority_sample": DS10_ORACLE,
    "hh1_frequent_items": HH1_ORACLE,
}
