"""K-means IVF (sim4): determinism of the quantized Lloyd update and
the probe contract.  Oracle parity is covered by test_oracle_parity's
auto-parametrization; these pin the properties that make that parity
POSSIBLE for an iterative float algorithm."""

from __future__ import annotations

from python_sql_datawarehouse_project_spark.operators import kmeans
from python_sql_datawarehouse_project_spark.operators.similarity import (
    TOP_K,
    N_QUERIES,
    _emb_normalized,
)


def test_training_is_bitwise_deterministic(spark, sf_dir):
    # Two independent trainings must agree on every bit: the quantized
    # integer means leave no room for summation-order drift.
    n = _emb_normalized(spark, sf_dir)
    a = kmeans.train_centroids(n)
    b = kmeans.train_centroids(n)
    assert a == b
    assert len(a) == kmeans.KM_K and all(len(c) == kmeans.DIM for c in a)


def test_update_moves_centroids_and_partitions_corpus(spark, sf_dir):
    n = _emb_normalized(spark, sf_dir)
    seed = kmeans.initial_centroids(n)
    trained = kmeans.lloyd_update(n, seed)
    assert trained != seed  # the update actually updates
    # every vector lands in exactly one list, lists cover the corpus
    from pyspark.sql import functions as F

    lists = n.select(
        kmeans._best_centroid(F.col("vn"), trained).alias("cid")
    )
    assert lists.count() == n.count()
    cids = {r.cid for r in lists.select("cid").distinct().collect()}
    assert cids <= set(range(kmeans.KM_K))


def test_sim4_topk_contract(spark, sf_dir):
    df = kmeans.sim4_ivf_kmeans_topk(spark, sf_dir)
    rows = df.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == set(range(N_QUERIES))
    for q, rs in per_q.items():
        assert len(rs) <= TOP_K
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)
