"""EmbIngestIndex: the persisted embedding-side ingest loop must
reproduce the inline ix2 gate bit-for-bit when built from the same
snapshot at the same band width (VERDICT r9 #3 'seams pytest-pinned
equal to the inline gate'), plus append/replay idempotency and the
frozen-width contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_sql_datawarehouse_project_spark.catalog import load_table
from python_sql_datawarehouse_project_spark.operators.dedup import _auto_bits
from python_sql_datawarehouse_project_spark.operators.incremental import _is_new
from python_sql_datawarehouse_project_spark.operators.ingest_verdict import (
    ix2_embedding_ingest_verdict,
)
from python_sql_datawarehouse_project_spark.operators.text import BENCH_MOD
from python_sql_datawarehouse_project_spark.plans.emb_index import (
    EmbIngestIndex,
)
from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse

BID = "batch000002"


def _roles(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    is_eval = F.col("vec_id") % BENCH_MOD == 0
    in_batch = ~is_eval & _is_new(F.col("vec_id"))
    return (
        emb.where(~is_eval & ~_is_new(F.col("vec_id"))),  # corpus
        emb.where(is_eval),
        emb.where(in_batch),
        emb.count(),
    )


@pytest.fixture(scope="module")
def built(spark, sf_dir, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("embidx")))
    corpus, evals, batch, n_total = _roles(spark, sf_dir)
    idx = EmbIngestIndex(wh)
    # the inline gate auto-sizes from the FULL table count (it bands
    # all roles in one frame); match its width for the parity pin
    counts = idx.build(spark, corpus, evals, bits=_auto_bits(n_total))
    return idx, batch, counts


def test_build_counts(built):
    idx, batch, counts = built
    assert counts["ann_lists"] > 0
    assert counts["emb_corpus_bands"] > 0
    assert counts["emb_eval_bands"] > 0
    assert counts["emb_meta"] == 1


def test_persisted_verdict_equals_inline_gate(spark, sf_dir, built):
    idx, batch, _ = built
    inline = {
        tuple(r)
        for r in ix2_embedding_ingest_verdict(spark, sf_dir).collect()
    }
    persisted = {
        tuple(r) for r in idx.ingest_verdict(spark, batch, BID).collect()
    }
    assert persisted == inline


def test_verdict_idempotent_after_land(spark, sf_dir, built):
    """Landing the batch then re-running the verdict for the SAME
    batch id excludes its own partitions from the corpus side — the
    replay contract every warehouse write shares."""
    idx, batch, _ = built
    before = {
        tuple(r) for r in idx.ingest_verdict(spark, batch, BID).collect()
    }
    keepers = batch.join(
        idx.ingest_verdict(spark, batch, BID)
        .where(F.col("n_eval_hits") == 0)
        .select("vec_id"),
        "vec_id",
        "left_semi",
    )
    landed = idx.land_batch(spark, keepers, BID)
    assert landed["ann_lists"] == keepers.count()
    after = {
        tuple(r) for r in idx.ingest_verdict(spark, batch, BID).collect()
    }
    assert after == before


def test_landed_batch_is_probed_by_next_ingest(spark, sf_dir, built):
    """A vector identical to one landed in BID must come back
    drop_duplicate with the landed vector as canonical on the NEXT
    batch — the persisted bands actually grow the corpus."""
    idx, batch, _ = built
    # materialize the verdict BEFORE landing: its lazy plan reads the
    # index parquet that land_batch's dynamic overwrite replaces
    rows = idx.ingest_verdict(spark, batch, BID).collect()
    survivor_ids = [r["vec_id"] for r in rows if r["n_eval_hits"] == 0]
    keepers = batch.where(F.col("vec_id").isin(survivor_ids))
    idx.land_batch(spark, keepers, BID)  # idempotent if already landed
    # a vector with NO prior corpus match: its clone's only candidate
    # at cosine 1.0 is the landed twin, so the canonical is unambiguous
    kept_id = min(r["vec_id"] for r in rows if r["action"] == "keep")
    one = batch.where(F.col("vec_id") == kept_id)
    clone = one.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    row = idx.ingest_verdict(spark, clone, "batch000003").collect()
    assert len(row) == 1
    assert row[0]["action"] == "drop_duplicate"
    assert row[0]["canonical_id"] == kept_id


def test_frozen_width_survives_reopen(spark, built):
    idx, _, _ = built
    reopened = EmbIngestIndex(idx.wh)
    assert reopened.bits() == idx.bits()


@pytest.mark.slow
def test_delete_keys_removes_vector_from_future_verdicts(
    spark, sf_dir, built
):
    """Takedown: after delete_keys, a clone of the deleted vector no
    longer matches it (no band row -> no candidate; no vn row -> no
    rescore), and the delete is replay-idempotent."""
    idx, batch, _ = built
    rows = idx.ingest_verdict(spark, batch, BID).collect()
    survivor_ids = [r["vec_id"] for r in rows if r["n_eval_hits"] == 0]
    keepers = batch.where(F.col("vec_id").isin(survivor_ids))
    idx.land_batch(spark, keepers, BID)  # idempotent if already landed
    kept_id = min(r["vec_id"] for r in rows if r["action"] == "keep")
    clone = batch.where(F.col("vec_id") == kept_id).select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"), "embedding"
    )
    before = idx.ingest_verdict(spark, clone, "batch000004").collect()[0]
    assert before["canonical_id"] == kept_id  # sanity: twin found
    keys = spark.createDataFrame([(kept_id,)], "vec_id long")
    deleted = idx.delete_keys(spark, keys)
    assert deleted["ann_lists"] == 1
    assert deleted["emb_corpus_bands"] >= 1
    after = idx.ingest_verdict(spark, clone, "batch000004").collect()[0]
    assert after["canonical_id"] != kept_id
    assert (
        idx.delete_keys(spark, keys)["ann_lists"] == 0
    )  # replay deletes nothing
