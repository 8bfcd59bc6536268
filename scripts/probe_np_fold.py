"""Probe (r10 optimization): can the interpreted Catalyst fold kernels
(normalize / banding projections / pair cosine) be replaced by
numpy kernels that are BIT-IDENTICAL?

The r8 conclusion ("numpy would break the determinism contract",
PERF.md sim8 second-decade diagnosis) only applies to np.dot/matmul,
whose pairwise/SIMD summation reorders the adds.  An explicit
per-dimension accumulation loop

    acc = 0; for j in range(dim): acc = acc + a[:, j] * b[:, j]

performs exactly the sequential left-fold — one IEEE multiply and one
IEEE add per element, in fold order, vectorized ACROSS ROWS — so it
must be bitwise equal to F.aggregate(zip_with(a,b,*), 0.0, +) and to
DuckDB's list_dot_product / list_reduce.  This script verifies that
claim empirically on the real sf0.1 embeddings table, for all three
kernels, at the bit level (struct.pack equality, not abs-diff):

  1. normalization:  vn = v / sqrt(seqdot(v, v))
  2. banding:        sign pattern of 24x5-plane projections -> band keys
  3. pair cosine:    seqdot(vn_a, vn_b) over the sim8 candidate pairs

and times Catalyst-fold vs numpy for the banding pass.
"""

from __future__ import annotations

import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark import session
    from python_sql_datawarehouse_project_spark.catalog import load_table
    from python_sql_datawarehouse_project_spark.functions import hashing as H
    from python_sql_datawarehouse_project_spark.operators.dedup import (
        AUTO_BANDS,
        _auto_bands,
        _auto_bits,
        _load_normalized,
    )
    from python_sql_datawarehouse_project_spark.operators.similarity import (
        SIM8_PROBES,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session.build_session(app_name="probe-np-fold")
    spark.sparkContext.setLogLevel("ERROR")

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
    )
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.array([r.v for r in rows], dtype=np.float64)
    n, dim = V.shape
    print(f"n={n} dim={dim}")

    # ---- reference: Catalyst fold normalization --------------------
    t0 = time.perf_counter()
    ref_n = _load_normalized(spark, sf_dir).orderBy("vec_id").collect()
    t_cat_norm = time.perf_counter() - t0
    ref_vn = np.array([r.vn for r in ref_n], dtype=np.float64)

    # ---- numpy sequential-fold normalization -----------------------
    t0 = time.perf_counter()
    acc = np.zeros(n)
    for j in range(dim):
        acc = acc + V[:, j] * V[:, j]
    vn = V / np.sqrt(acc)[:, None]
    t_np_norm = time.perf_counter() - t0
    same = all(
        bits(float(a)) == bits(float(b))
        for a, b in zip(ref_vn.ravel()[::7], vn.ravel()[::7])
    )
    exact = np.array_equal(
        ref_vn.view(np.int64), vn.view(np.int64)
    )
    print(f"norm bit-identical: sampled={same} full={exact} "
          f"catalyst={t_cat_norm:.2f}s numpy={t_np_norm:.4f}s")

    # ---- banding: Catalyst vs numpy --------------------------------
    bits_n = _auto_bits(n)
    bands_count = AUTO_BANDS * SIM8_PROBES
    nf = _load_normalized(spark, sf_dir)
    t0 = time.perf_counter()
    ref_bands = (
        _auto_bands(nf, bits_n, bands_count)
        .orderBy("vec_id", "band_key")
        .collect()
    )
    t_cat_band = time.perf_counter() - t0
    ref_pairs = [(r.vec_id, r.band_key) for r in ref_bands]

    planes = np.array(H.rp_planes(bands_count * bits_n), dtype=np.float64)
    t0 = time.perf_counter()
    P = planes.shape[0]
    proj = np.zeros((n, P))
    for j in range(dim):
        proj = proj + vn[:, j:j + 1] * planes[:, j]
    sign = proj > 0
    keys = np.empty((n, bands_count), dtype=np.int64)
    for k in range(bands_count):
        key = np.full(n, k << bits_n, dtype=np.int64)
        for t in range(bits_n):
            key += sign[:, k * bits_n + t].astype(np.int64) << t
        keys[:, k] = key
    t_np_band = time.perf_counter() - t0
    np_pairs = sorted(
        (int(i), int(k)) for i, row in zip(ids, keys) for k in row
    )
    print(f"banding identical: {np_pairs == sorted(ref_pairs)} "
          f"(n_keys {len(np_pairs)} vs {len(ref_pairs)}) "
          f"catalyst={t_cat_band:.2f}s numpy={t_np_band:.4f}s")

    # ---- pair cosine over a candidate sample -----------------------
    rng_idx = np.arange(0, n - 1)
    a_idx, b_idx = rng_idx, (rng_idx + 1) % n
    t0 = time.perf_counter()
    pacc = np.zeros(len(a_idx))
    for j in range(dim):
        pacc = pacc + vn[a_idx, j] * vn[b_idx, j]
    t_np_pair = time.perf_counter() - t0

    import pandas as pd  # noqa: F401

    pairs_df = spark.createDataFrame(
        [(int(ids[i]), int(ids[jx])) for i, jx in zip(a_idx, b_idx)],
        "vec_a long, vec_b long",
    )
    nf2 = _load_normalized(spark, sf_dir)
    a = nf2.select(F.col("vec_id").alias("vec_a"), F.col("vn").alias("va"))
    b = nf2.select(F.col("vec_id").alias("vec_b"), F.col("vn").alias("vb"))
    t0 = time.perf_counter()
    scored = (
        pairs_df.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b",
                H.dot_fold(F.col("va"), F.col("vb")).alias("cosine"))
        .orderBy("vec_a")
        .collect()
    )
    t_cat_pair = time.perf_counter() - t0
    cat_cos = {(r.vec_a, r.vec_b): r.cosine for r in scored}
    mism = 0
    for i, jx, c in zip(a_idx, b_idx, pacc):
        ref = cat_cos[(int(ids[i]), int(ids[jx]))]
        if bits(float(ref)) != bits(float(c)):
            mism += 1
    print(f"pair cosine bit-identical: mismatches={mism}/{len(a_idx)} "
          f"catalyst={t_cat_pair:.2f}s numpy={t_np_pair:.4f}s")


if __name__ == "__main__":
    main()
