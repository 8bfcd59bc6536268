"""Per-ingest cost of the PERSISTED-index loop across decades
(VERDICT r8 #4, second half: ix1_ingest_verdict is the oracled inline
composition; this script measures the loop a deployment actually
schedules, where the corpus-side grams/sketches/bands/bloom live in
warehouse index tables built once).

Setup (reported, NOT the claim): split `documents` into the same
roles as ix1 — benchmark (doc_id % BENCH_MOD == 0), new
(md5-gate, dd11's NEW_MOD), corpus (the rest) — then

    DedupIndex(capped=True).build_docs(corpus)   once, cost ~ corpus
    BloomIndex.build(benchmark grams)            once per release

The index is CAPPED (dd17 occupancy policy at rest): this synthetic
corpus's duplicate families densify super-linearly (measured here:
15.6k pairs at sf0.1 -> 16.5M at sf1 UNCAPPED), which is exactly the
regime the capped production path exists for.

Per-ingest VERDICT (the claim: ~flat while the corpus grows 10x per
decade; the batch is clamped to a fixed BATCH_DOCS at every SF):

    screen       batch grams -> BloomIndex.probe (broadcast ~1 MiB
                 word table; one pass over the batch's grams)
    probe_land   append_batch(survivors, refresh_clusters=False):
                 sketch ONLY the batch, band-join against the
                 persisted capped corpus bands, land the batch's
                 index partitions
    keep_route   per surviving doc: corpus matches from the landed
                 pairs, canonical = the persisted keep-list row of
                 the best match's cluster

MAINTENANCE (timed separately, scheduled at its own cadence):

    cluster_refresh   fold the batch's pairs into the cluster labels
                      (cost ~ touched components, which in THIS
                      dense synthetic corpus is most of the graph —
                      the honest number, see dedup_index.py's
                      measured note)

Prints ONE JSON line; paste into PERF.md.

Usage:
    python scripts/bench_ingest_loop.py [--sf-dir /root/testdata/sf0.1]
        [--root /root/repo/.scratch/bench_ingest] [--skip-refresh]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_DOCS = 500  # fixed absolute ingest size at every SF
BID = "batch000002"  # sorts after the base id "base"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--root", default="/root/repo/.scratch/bench_ingest")
    ap.add_argument("--skip-refresh", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.catalog import load_table
    from python_sql_datawarehouse_project_spark.operators.incremental import (
        _is_new,
    )
    from python_sql_datawarehouse_project_spark.operators.text import (
        BENCH_MOD,
        _doc_grams,
    )
    from python_sql_datawarehouse_project_spark.plans.bloom_index import (
        BloomIndex,
    )
    from python_sql_datawarehouse_project_spark.plans.dedup_index import (
        LAYER,
        DedupIndex,
    )
    from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse
    from python_sql_datawarehouse_project_spark.session import build_session

    spark = build_session(app_name="bench-ingest-loop", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(args.root, ignore_errors=True)
    wh = Warehouse(spark, args.root)

    docs = load_table(spark, args.sf_dir, "documents")
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    corpus = docs.where(~is_bench & ~_is_new(F.col("doc_id")))
    batch = (
        docs.where(~is_bench & _is_new(F.col("doc_id")))
        .orderBy("doc_id")
        .limit(BATCH_DOCS)
        .localCheckpoint(eager=True)  # clamp once; reused by both stages
    )
    bench_grams = _doc_grams(docs.where(is_bench)).select("h").distinct()

    build_sec, ingest_sec, maint_sec, counts = {}, {}, {}, {}
    didx = DedupIndex(wh, batch_id="base", capped=True)
    t = time.perf_counter()
    base_counts = didx.build_docs(spark, corpus)
    build_sec["dedup_index"] = round(time.perf_counter() - t, 1)
    t = time.perf_counter()
    bidx = BloomIndex(wh)
    counts["bloom_words"] = bidx.build(spark, bench_grams, "base")
    build_sec["bloom_index"] = round(time.perf_counter() - t, 1)
    counts["corpus_docs"] = base_counts["doc_ids"]
    counts["corpus_pairs"] = base_counts["text_pairs"]

    # -- per-ingest verdict ---------------------------------------------
    t = time.perf_counter()
    hits = bidx.probe(spark, _doc_grams(batch))
    survivors = batch.join(
        hits.where(F.col("n_bloom_hits") > 0).select("doc_id"),
        "doc_id",
        "left_anti",
    ).localCheckpoint(eager=True)
    counts["batch_docs"] = batch.count()
    counts["survivors"] = survivors.count()
    ingest_sec["screen"] = round(time.perf_counter() - t, 1)

    t = time.perf_counter()
    appended = didx.append_batch(spark, survivors, BID, refresh_clusters=False)
    ingest_sec["probe_land"] = round(time.perf_counter() - t, 1)
    counts["new_pairs"] = appended["text_pairs"]

    t = time.perf_counter()
    new_ids = wh.read_batch(LAYER, "doc_ids", BID).select("doc_id")
    pairs = wh.read_batch(LAYER, "text_pairs", BID)
    a_new = new_ids.withColumnRenamed("doc_id", "doc_a")
    b_new = new_ids.withColumnRenamed("doc_id", "doc_b")
    cross = (
        pairs.join(a_new, "doc_a", "left_semi")
        .join(b_new, "doc_b", "left_anti")
        .select(
            F.col("doc_a").alias("new_id"),
            F.col("doc_b").alias("corpus_id"),
            "jaccard_est",
        )
        .unionByName(
            pairs.join(b_new, "doc_b", "left_semi")
            .join(a_new, "doc_a", "left_anti")
            .select(
                F.col("doc_b").alias("new_id"),
                F.col("doc_a").alias("corpus_id"),
                "jaccard_est",
            )
        )
    )
    keepers = (
        didx._latest("clusters")
        .where(F.col("keep"))
        .select("cluster_id", F.col("doc_id").alias("canonical_id"))
    )
    routed = (
        cross.join(
            didx._latest("clusters").select("doc_id", "cluster_id"),
            cross["corpus_id"] == F.col("doc_id"),
        )
        .join(keepers, "cluster_id")
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).alias("n_corpus_dups"),
            F.max(
                F.struct(
                    F.col("jaccard_est").alias("j"),
                    (-F.col("canonical_id")).alias("neg"),
                )
            ).alias("best"),
        )
    )
    counts["dup_verdicts"] = routed.count()
    ingest_sec["keep_route"] = round(time.perf_counter() - t, 1)
    ingest_sec["verdict_total"] = round(sum(ingest_sec.values()), 1)

    # -- deferred maintenance --------------------------------------------
    if not args.skip_refresh:
        t = time.perf_counter()
        counts["cluster_rows"] = didx.refresh_clusters(spark, BID)
        maint_sec["cluster_refresh"] = round(time.perf_counter() - t, 1)

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "batch_target": BATCH_DOCS,
                "capped_index": True,
                "build_sec": build_sec,
                "ingest_sec": ingest_sec,
                "maintenance_sec": maint_sec,
                "counts": counts,
            }
        )
    )
    shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
