"""Per-ingest cost of the PERSISTED embedding-verdict loop across
decades (VERDICT r9 #3, second half: ix2_embedding_ingest_verdict is
the oracled inline composition; this measures the loop a deployment
schedules, where the corpus vectors/bands and the eval release live
in warehouse index tables built once — plans/emb_index.py).

Protocol mirrors the text side (scripts/bench_ingest_loop.py):

Setup (reported, NOT the claim): split `embeddings` into ix2's roles
— eval (vec_id % BENCH_MOD == 0), new (md5-gate, dd11's NEW_MOD),
corpus (the rest) — then

    EmbIngestIndex.build(corpus, eval)    once, cost ~ corpus
    (AnnIndex vector store + capped auto-banded corpus bands +
     eval vn/bands + frozen band width)

Per-ingest VERDICT (the claim: ~flat while the corpus grows 10x per
decade; the batch is clamped to a fixed BATCH_VECS at every SF):

    verdict   ingest_verdict(batch): normalize + band the BATCH at
              the frozen width, eval screen via the persisted eval
              bands, capped corpus probe via the persisted corpus
              bands, exact cosine rescore via persisted vn tables
    land      AnnIndex.append_vectors (frozen-centroid assign) +
              the batch's capped band partition

Prints ONE JSON line; paste into PERF.md.

Usage:
    python scripts/bench_emb_ingest_loop.py [--sf-dir /root/testdata/sf0.1]
        [--root /root/repo/.scratch/bench_emb_ingest]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_VECS = 200  # fixed absolute ingest size at every SF
BID = "batch000002"  # sorts after the base id "base"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--root", default="/root/repo/.scratch/bench_emb_ingest")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.catalog import load_table
    from python_sql_datawarehouse_project_spark.operators.incremental import (
        _is_new,
    )
    from python_sql_datawarehouse_project_spark.operators.text import BENCH_MOD
    from python_sql_datawarehouse_project_spark.plans.emb_index import (
        EmbIngestIndex,
    )
    from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse
    from python_sql_datawarehouse_project_spark.session import build_session

    spark = build_session(app_name="bench-emb-ingest", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(args.root, ignore_errors=True)
    wh = Warehouse(spark, args.root)

    emb = load_table(spark, args.sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    is_eval = F.col("vec_id") % BENCH_MOD == 0
    corpus = emb.where(~is_eval & ~_is_new(F.col("vec_id")))
    evals = emb.where(is_eval)
    batch = (
        emb.where(~is_eval & _is_new(F.col("vec_id")))
        .orderBy("vec_id")
        .limit(BATCH_VECS)
        .localCheckpoint(eager=True)  # clamp once; reused by both stages
    )

    build_sec, ingest_sec, counts = {}, {}, {}
    idx = EmbIngestIndex(wh)
    t = time.perf_counter()
    base_counts = idx.build(spark, corpus, evals)
    build_sec["emb_index"] = round(time.perf_counter() - t, 1)
    counts["corpus_vectors"] = base_counts["ann_lists"]
    counts["corpus_band_rows"] = base_counts["emb_corpus_bands"]
    counts["eval_vectors"] = base_counts["emb_eval_vn"]
    counts["band_bits"] = idx.bits()

    t = time.perf_counter()
    verdict = idx.ingest_verdict(spark, batch, BID).collect()
    ingest_sec["verdict"] = round(time.perf_counter() - t, 1)
    counts["batch_vecs"] = len(verdict)
    counts["contaminated"] = sum(
        1 for r in verdict if r["action"] == "drop_contaminated"
    )
    counts["duplicates"] = sum(
        1 for r in verdict if r["action"] == "drop_duplicate"
    )
    counts["kept"] = sum(1 for r in verdict if r["action"] == "keep")

    t = time.perf_counter()
    survivor_ids = [r["vec_id"] for r in verdict if r["n_eval_hits"] == 0]
    keepers = batch.where(F.col("vec_id").isin(survivor_ids))
    landed = idx.land_batch(spark, keepers, BID)
    ingest_sec["land"] = round(time.perf_counter() - t, 1)
    counts["landed_vectors"] = landed["ann_lists"]
    ingest_sec["verdict_total"] = round(sum(ingest_sec.values()), 1)

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "batch_target": BATCH_VECS,
                "capped_index": True,
                "build_sec": build_sec,
                "ingest_sec": ingest_sec,
                "counts": counts,
            }
        )
    )
    shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
