"""Stage-level profile of sim8_knn_graph_capped across SF decades
(VERDICT r7 #6: diagnose whether the second-decade exponent (0.81 at
sf10 vs 0.40 in the first decade) comes from candidate MASS (cap too
generous as buckets fill) or from the rank tail's shuffle).

Each stage is materialized behind a localCheckpoint so its timer
isolates that stage's work (the production gate runs the same plan
fused; the sum here is an upper bound on the fused wall).

    stage 1  load + normalize + checkpoint (vector scan, fold math)
    stage 2  multi-probe auto-sized banding (id-only band rows)
    stage 3  capped-ring candidate generation + distinct
    stage 4  rank tail: symmetrize, 2x vector join, dot fold,
             per-source top-K window

Usage:
    python scripts/profile_sim8.py [--sf-dir /root/repo/.scratch/sf1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.scratch/sf1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.operators.dedup import (
        AUTO_BANDS,
        _auto_bands,
        _auto_bits,
        _load_normalized,
    )
    from python_sql_datawarehouse_project_spark.operators.similarity import (
        SIM8_OCC_CAP,
        SIM8_PROBES,
        _knn_rank_pairs,
        _sim8_capped_ring_candidates,
    )
    from python_sql_datawarehouse_project_spark.session import build_session

    spark = build_session(app_name="profile-sim8", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    out = {"sf_dir": args.sf_dir, "probes": SIM8_PROBES, "cap": SIM8_OCC_CAP}

    t = time.perf_counter()
    n = _load_normalized(spark, args.sf_dir).localCheckpoint(eager=True)
    n_vecs = n.count()
    out["n_vectors"] = n_vecs
    out["s1_normalize_sec"] = round(time.perf_counter() - t, 1)

    t = time.perf_counter()
    bits = _auto_bits(n_vecs)
    bands = _auto_bands(n, bits, AUTO_BANDS * SIM8_PROBES).localCheckpoint(
        eager=True
    )
    out["bits"] = bits
    out["band_rows"] = bands.count()
    out["s2_banding_sec"] = round(time.perf_counter() - t, 1)

    # occupancy distribution: how much candidate mass each regime makes
    occ = bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("occ"))
    stats = occ.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum(F.when(F.col("occ") > SIM8_OCC_CAP, 1).otherwise(0)).alias(
            "over_cap_buckets"
        ),
        # exact pair mass from small buckets: occ*(occ-1)/2
        F.sum(
            F.when(
                F.col("occ") <= SIM8_OCC_CAP,
                F.col("occ") * (F.col("occ") - 1) / 2,
            ).otherwise(0)
        ).alias("small_pair_mass"),
        # ring mass from over-cap buckets: ~occ*ring
        F.sum(
            F.when(F.col("occ") > SIM8_OCC_CAP, F.col("occ")).otherwise(0)
        ).alias("over_cap_rows"),
        F.max("occ").alias("max_occ"),
    ).first()
    out["buckets"] = stats.buckets
    out["over_cap_buckets"] = stats.over_cap_buckets
    out["small_pair_mass"] = int(stats.small_pair_mass)
    out["over_cap_rows"] = int(stats.over_cap_rows or 0)
    out["max_occ"] = stats.max_occ

    t = time.perf_counter()
    cand = _sim8_capped_ring_candidates(bands).localCheckpoint(eager=True)
    out["candidate_pairs"] = cand.count()
    out["s3_candidates_sec"] = round(time.perf_counter() - t, 1)

    t = time.perf_counter()
    knn = _knn_rank_pairs(n, cand)
    out["knn_rows"] = knn.count()
    out["s4_rank_tail_sec"] = round(time.perf_counter() - t, 1)

    out["total_sec"] = round(
        out["s1_normalize_sec"]
        + out["s2_banding_sec"]
        + out["s3_candidates_sec"]
        + out["s4_rank_tail_sec"],
        1,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
