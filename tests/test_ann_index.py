"""AnnIndex: the persisted IVF index must serve the sim4 gate's
results bit-for-bit from stored state, and its cid-partitioned lists
must be dynamically pruned by the probe join."""

from __future__ import annotations

import pytest

from python_sql_datawarehouse_project_spark.operators.kmeans import (
    N_QUERIES,
    sim4_ivf_kmeans_topk,
)
from python_sql_datawarehouse_project_spark.plans.ann_index import AnnIndex
from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse


@pytest.fixture(scope="module")
def ann(spark, sf_dir, tmp_path_factory):
    idx = AnnIndex(Warehouse(spark, str(tmp_path_factory.mktemp("ann"))))
    counts = idx.build(spark, sf_dir)
    assert counts["ann_centroids"] > 0 and counts["ann_lists"] > 0
    return idx


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_index_served_topk_equals_sim4_gate(spark, sf_dir, ann):
    served = ann.topk_corpus_queries(spark, N_QUERIES)
    assert _rows(served) == _rows(sim4_ivf_kmeans_topk(spark, sf_dir))


def test_probe_scan_is_dynamically_pruned(spark, ann):
    # the broadcast probe side carries the NPROBE cids per query, so
    # the cid-partitioned lists scan must plan a dynamic partition
    # pruning subquery — only probed lists are read from storage
    df = ann.topk_corpus_queries(spark, N_QUERIES)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


@pytest.mark.slow
def test_rebuild_is_idempotent(spark, sf_dir, ann):
    before = _rows(ann.topk_corpus_queries(spark, N_QUERIES))
    ann.build(spark, sf_dir)
    assert _rows(ann.topk_corpus_queries(spark, N_QUERIES)) == before


@pytest.mark.slow
def test_append_vectors_frozen_centroids(spark, sf_dir, tmp_path_factory):
    """Half-corpus build + append of the other half: appended vectors
    land under the FROZEN quantizer (no retrain), are served by the
    probe, and a replayed append changes nothing (dynamic overwrite
    of the batch's partitions)."""
    from python_sql_datawarehouse_project_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = AnnIndex(Warehouse(spark, str(tmp_path_factory.mktemp("ann_app"))))

    # build over the even half only (temp view trick not needed: the
    # index APIs take frames; build() reads the table, so stage a
    # half-corpus parquet dir)
    import os

    half_dir = str(tmp_path_factory.mktemp("half_sf"))
    emb.filter("vec_id % 2 = 0").write.parquet(
        os.path.join(half_dir, "embeddings.parquet")
    )
    cents_before = None
    idx.build(spark, half_dir)
    cents_before = idx.centroids(spark)

    n_new = idx.append_vectors(spark, emb.filter("vec_id % 2 = 1"), "b001")
    assert n_new == emb.filter("vec_id % 2 = 1").count()
    assert idx.centroids(spark) == cents_before  # frozen quantizer
    total = idx.lists(spark).count()
    assert total == emb.count()
    # an appended vector queried as its own copy self-matches at rank 1
    one = (
        idx.lists(spark)
        .filter("vec_id % 2 = 1")
        .orderBy("vec_id")
        .limit(1)
        .select("vec_id", "vn")
    )
    ext = one.selectExpr("vec_id + 1000000 AS query_id", "vn AS qv")
    res = {r["rank"]: r["neighbor_id"] for r in idx.topk(spark, ext).collect()}
    assert res[1] == one.collect()[0]["vec_id"]
    # replayed append converges
    idx.append_vectors(spark, emb.filter("vec_id % 2 = 1"), "b001")
    assert idx.lists(spark).count() == total


def test_topk_accepts_external_queries(spark, ann):
    # any normalized (query_id, qv) frame probes the index — take two
    # stored vectors as "external" queries and check self-match rank 1
    q = (
        ann.lists(spark)
        .orderBy("vec_id")
        .limit(2)
        .select("vec_id", "vn")
    )
    ext = q.selectExpr("vec_id + 1000000 AS query_id", "vn AS qv")
    res = ann.topk(spark, ext)
    ids = {r["query_id"] for r in res.collect()}
    assert ids == {r["vec_id"] + 1000000 for r in q.collect()}
    top = {
        r["query_id"]: r["neighbor_id"]
        for r in res.collect()
        if r["rank"] == 1
    }
    # rank-1 neighbor of a copied vector is the original (cosine 1.0)
    assert top == {r["vec_id"] + 1000000: r["vec_id"] for r in q.collect()}


@pytest.mark.slow
def test_delete_keys_equals_rebuild_without_keys(
    spark, sf_dir, tmp_path_factory
):
    """The takedown contract (VERDICT r6 #7): delete + re-query must
    equal an index whose lists never contained the keys — same frozen
    centroids, same probe — and a replayed delete is a no-op.  Built
    over a staged corpus so the 'rebuild without keys' twin shares the
    exact quantizer (delete must never retrain)."""
    import os

    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = AnnIndex(Warehouse(spark, str(tmp_path_factory.mktemp("ann_del"))))
    idx.build(spark, sf_dir)
    n_total = idx.lists(spark).count()

    doomed = emb.select("vec_id").orderBy("vec_id").limit(7)
    doomed_ids = {r["vec_id"] for r in doomed.collect()}

    n_del = idx.delete_keys(spark, doomed)
    assert n_del == len(doomed_ids)
    assert idx.lists(spark).count() == n_total - n_del
    assert (
        idx.lists(spark)
        .join(F.broadcast(doomed), "vec_id", "left_semi")
        .count()
        == 0
    )

    # twin: same centroids, lists re-assigned from the surviving
    # vectors only — topk over shared external queries must agree
    twin = AnnIndex(
        Warehouse(spark, str(tmp_path_factory.mktemp("ann_del_twin")))
    )
    twin_dir = str(tmp_path_factory.mktemp("ann_del_sf"))
    emb.join(F.broadcast(doomed), "vec_id", "left_anti").write.parquet(
        os.path.join(twin_dir, "embeddings.parquet")
    )
    twin.wh.write_batch(
        spark.createDataFrame(
            [(cid, c) for cid, c in enumerate(idx.centroids(spark))],
            "cid int, c array<double>",
        ),
        "index",
        "ann_centroids",
        "full",
    )
    survivors = idx.lists(spark).select("vec_id", "vn")
    twin.append_vectors(
        spark,
        load_table(spark, twin_dir, "embeddings"),
        "full",
    )
    q = survivors.orderBy("vec_id").limit(5)
    ext = q.selectExpr("vec_id + 1000000 AS query_id", "vn AS qv")
    assert _rows(idx.topk(spark, ext)) == _rows(twin.topk(spark, ext))

    # replay: same delete finds nothing
    assert idx.delete_keys(spark, doomed) == 0
    assert idx.lists(spark).count() == n_total - n_del
