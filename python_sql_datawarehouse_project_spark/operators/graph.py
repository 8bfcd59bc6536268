"""Iterative graph fixpoint with EXACT cross-engine parity —
PageRank over the near-dup graph in int64 fixed-point arithmetic.

  gr1_pagerank_fixedpoint   4 PageRank iterations over dd17's capped
                            minhash pair graph (symmetrized), ranks
                            carried as int64 fixed-point at SCALE =
                            10^12

Why this exists: the registry's recursion family (q9/q43) proves
driver-loop FRONTIER iteration; this gate proves the other iterative
shape a warehouse needs — a NUMERIC fixpoint (PageRank/label
propagation/HITS) where every iteration re-aggregates over the whole
edge set.  Centrality over the near-dup graph is also a real dedup
signal: a document ranking high sits in a dense copy neighborhood
even when pairwise scores hover at the threshold.

The float problem and its fix: textbook PageRank sums damped float
contributions, and float sums are accumulation-order-dependent — a
cluster-vs-oracle hash would be flaky by construction.  Every
quantity here is instead an int64:

  * damping 0.85 == 17/20 EXACTLY, so a contribution is
    (rank * 17) div (20 * deg) — truncating integer division, both
    engines agree on every edge;
  * per-node update = TELEPORT + SUM(int64 contributions): integer
    addition is associative-commutative, so ANY partitioning/order
    gives the identical total (same argument as the exact-int
    sufficient statistics in qa12/qa20);
  * TELEPORT = (3 * SCALE) div (20 * N) computed from the corpus
    count on both sides.

Overflow headroom: total rank mass is <= SCALE + N*TELEPORT-ish
~ 1.2e12; per-edge product rank*17 <= ~2e13 << 2^63.

Dangling nodes (no out-edges) leak their damped mass by design (the
standard simplification); isolated docs hold TELEPORT rank — the
output covers the ENTIRE corpus, not just the edge set.

Scale: each iteration is one equi-join of the edge list to the rank
vector plus one map-side-combinable SUM by dst — the Pregel shape.
Edges and degrees are localCheckpointed once; iterations reuse them.
The edge set itself is dd17's occupancy-capped LSH output (bounded
per-bucket mass — see dedup.py), so the join fan-out stays linear in
corpus size.  Iteration count is fixed (4), not convergence-tested:
a production run gates on residual; the fixed count keeps the gate
deterministic and the oracle unrollable.

Reference anchor: the reference has no graph operators; this extends
the dedup family (BASELINE.json north star) the same way dd7's
connected components do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..catalog import load_table
from ..functions import hashing as H

GR1_SCALE = 10**12
GR1_ITERS = 4


def gr1_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import (
        EST_T,
        _capped_lsh_candidates,
        _doc_sketches,
        _sig_agreement,
    )

    docs = load_table(spark, sf_dir, "documents")
    nodes = docs.select("doc_id").localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("doc_id", LongType()),
                    StructField("degree", LongType()),
                    StructField("rank", LongType()),
                ]
            ),
        )
    pairs = (
        _capped_lsh_candidates(_doc_sketches(docs))
        .select("doc_a", "doc_b", _sig_agreement().alias("j"))
        .filter(F.col("j") >= EST_T)
        .select("doc_a", "doc_b")
    )
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    # r10 (guide §2.4/§4, "Catalyst does not share common subplans"):
    # the unrolled 4-iteration plan referenced `deg` (a groupBy over
    # the edge set) once per iteration plus once in the output
    # projection — five evaluations of the same aggregate — and paid
    # TWO joins per iteration (edges⋈ranks, then ⋈deg on the same
    # src key) plus a third against the FULL node table to re-attach
    # teleport rank.  Three restructures, all bit-identical:
    #   1. degree is iteration-invariant -> edges⋈deg attached ONCE
    #      and checkpointed; each iteration is a single equi-join +
    #      map-side-combinable SUM (the minimal Pregel step);
    #   2. mid-loop ranks only matter for nodes WITH OUT-EDGES (a
    #      dangling/isolated node's rank never feeds a contribution
    #      by construction — the documented leak), so the loop
    #      carries ranks at SRC-NODE grain and the full corpus node
    #      table is joined exactly once, on the final iteration's
    #      contributions.  At 100 TB that turns 4 corpus-sized
    #      per-iteration joins into joins bounded by the near-dup
    #      graph's node count (<< corpus), and the bench-scale rank
    #      frame becomes broadcastable;
    #   3. `deg` is checkpointed for the final projection instead of
    #      re-aggregating the edges.
    # Per-node values are unchanged: a src node's rank formula is
    # teleport + coalesce(s, 0) in both forms, and non-src nodes get
    # the same formula once at the end.  Plan: 12 joins -> 9, five
    # edge-set re-aggregations -> 1, and every loop-side join operand
    # drops from corpus grain to graph grain (initial plan: 36
    # Exchange -> 28; the remaining SMJs are stats-less checkpoint
    # inputs that AQE converts to broadcast at runtime now that the
    # rank frames are graph-sized —
    # plans/r10/gr1_pagerank_fixedpoint_{before,after}.txt); oracle
    # re-verified at sf0.001/sf0.01/sf0.1 after the restructure.
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=True)
    teleport = (3 * GR1_SCALE) // (20 * n)
    # Explicit BIGINT literals: at corpus scale the initial rank
    # (SCALE // n) can fit int32, and an IntegerType literal makes
    # rank * 17 overflow 32-bit silently (or raise under ANSI).
    src_nodes = deg.select("src")
    ranks = src_nodes.select(
        F.col("src").alias("doc_id"),
        F.lit(GR1_SCALE // n).cast("long").alias("rank"),
    )
    contrib = None
    for it in range(GR1_ITERS):
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["doc_id"])
            .select(
                "dst",
                F.expr("(rank * 17) div (20 * d)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        if it < GR1_ITERS - 1:
            ranks = src_nodes.join(
                contrib, src_nodes["src"] == contrib["dst"], "left"
            ).select(
                F.col("src").alias("doc_id"),
                (
                    F.lit(teleport).cast("long")
                    + F.coalesce(F.col("s"), F.lit(0).cast("long"))
                ).alias("rank"),
            )
    final = nodes.join(
        contrib, nodes["doc_id"] == contrib["dst"], "left"
    ).select(
        "doc_id",
        (
            F.lit(teleport).cast("long")
            + F.coalesce(F.col("s"), F.lit(0).cast("long"))
        ).alias("rank"),
    )
    return (
        final.join(deg, final["doc_id"] == deg["src"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("degree"),
            "rank",
        )
    )


def _gr1_oracle() -> str:
    from .dedup import EST_T, _sql_capped_sketch_ctes

    jacc = (
        "CAST(len(list_filter(list_zip(sig_a, sig_b), p -> p[1] = p[2])) "
        f"AS DOUBLE) / {float(H.MINHASH_K)}"
    )
    iters = []
    for k in range(GR1_ITERS):
        iters.append(
            f"""c{k} AS (
    SELECT e.dst,
           CAST(SUM((r.rank * 17) // (20 * dg.d)) AS BIGINT) AS s
    FROM edges e
    JOIN r{k} r ON e.src = r.doc_id
    JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
),
r{k + 1} AS (
    SELECT nd.doc_id,
           CAST((3 * {GR1_SCALE}) // (20 * m.n) AS BIGINT)
           + COALESCE(c.s, 0) AS rank
    FROM nodes nd CROSS JOIN meta m
    LEFT JOIN c{k} c ON c.dst = nd.doc_id
)"""
        )
    chain = ",\n".join(iters)
    return f"""
WITH {_sql_capped_sketch_ctes()},
jpairs AS (
    SELECT doc_a, doc_b FROM cand WHERE {jacc} >= {EST_T}
),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM jpairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM jpairs
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
nodes AS (SELECT doc_id FROM documents),
meta AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (
    SELECT nd.doc_id, CAST({GR1_SCALE} // m.n AS BIGINT) AS rank
    FROM nodes nd CROSS JOIN meta m
),
{chain}
SELECT r.doc_id,
       COALESCE(dg.d, 0) AS degree,
       r.rank
FROM r{GR1_ITERS} r LEFT JOIN deg dg ON r.doc_id = dg.src
"""


GR1_ORACLE = _gr1_oracle()

QUERIES = {"gr1_pagerank_fixedpoint": gr1_pagerank_fixedpoint}
ORACLES = {"gr1_pagerank_fixedpoint": GR1_ORACLE}
