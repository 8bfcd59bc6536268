"""DedupIndex: the persisted candidate/cluster index must feed cs1,
dd13 and dd7 results BIT-IDENTICAL to the inline oracled gates
(VERDICT r5 "Next round" #3 — done = pytest showing index-fed
cs1/dd13 equal the inline gates bit-for-bit)."""

from __future__ import annotations

import pytest

from python_sql_datawarehouse_project_spark.operators.dedup import (
    cs1_canonical_selection,
    cs2_capped_canonical_pipeline,
    dd7_dup_clusters,
    dd13_ensemble_agreement,
)
from python_sql_datawarehouse_project_spark.plans.dedup_index import DedupIndex
from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse


@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("dedup_index")))
    index = DedupIndex(wh)
    counts = index.build(spark, sf_dir)
    assert counts["clusters"] > 0
    return index


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_index_fed_cs1_equals_inline_gate(spark, sf_dir, idx):
    assert _rows(idx.cs1_canonical_selection(spark, sf_dir)) == _rows(
        cs1_canonical_selection(spark, sf_dir)
    )


@pytest.mark.slow
def test_index_fed_variant_pins_cs2_composed_pipeline(spark, sf_dir, idx):
    # Below the occupancy cap dd17 == dd3 bit-for-bit, so the composed
    # capped pipeline gate (cs2, VERDICT r6 #3) must equal BOTH the
    # inline cs1 and the index-fed variant — one verdict, three paths.
    got = _rows(cs2_capped_canonical_pipeline(spark, sf_dir))
    assert got == _rows(cs1_canonical_selection(spark, sf_dir))
    assert got == _rows(idx.cs1_canonical_selection(spark, sf_dir))


@pytest.mark.slow
def test_index_fed_dd13_equals_inline_gate(spark, sf_dir, idx):
    assert _rows(idx.dd13_ensemble_agreement()) == _rows(
        dd13_ensemble_agreement(spark, sf_dir)
    )


@pytest.mark.slow
def test_index_fed_dd7_equals_inline_gate(spark, sf_dir, idx):
    assert _rows(idx.dd7_dup_clusters()) == _rows(
        dd7_dup_clusters(spark, sf_dir)
    )


@pytest.mark.slow
def test_rebuild_is_idempotent(spark, sf_dir, idx):
    before = _rows(idx.dd13_ensemble_agreement())
    counts = idx.build(spark, sf_dir)  # same snapshot, same batch_id
    assert counts["text_pairs"] > 0
    assert _rows(idx.dd13_ensemble_agreement()) == before


# -- incremental append == from-scratch rebuild (the dd11 seam) -------
@pytest.mark.slow
def test_append_batch_equals_full_rebuild(spark, sf_dir, tmp_path_factory):
    """Growing the index one batch at a time must land on EXACTLY the
    state a from-scratch rebuild over the union produces: text_pairs
    (union of base + append partitions) and the latest cluster labels
    are compared bit-for-bit.  This is the 100 TB ingestion contract —
    per-ingest cost scales with the batch via the persisted band
    probe, with zero drift from the batch boundaries."""
    from python_sql_datawarehouse_project_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs_even = docs.filter("doc_id % 2 = 0")
    docs_odd = docs.filter("doc_id % 2 = 1")

    incr = DedupIndex(
        Warehouse(spark, str(tmp_path_factory.mktemp("idx_incr"))), "b000"
    )
    incr._ingest_docs(spark, docs_even, "b000", base=True)
    c1 = incr.append_batch(spark, docs_odd, "b001")
    assert c1["text_pairs"] > 0  # cross near-dups must exist at sf0.001

    full = DedupIndex(
        Warehouse(spark, str(tmp_path_factory.mktemp("idx_full"))), "b000"
    )
    full._ingest_docs(spark, docs, "b000", base=True)

    assert _rows(incr._all("text_pairs")) == _rows(full._all("text_pairs"))
    assert _rows(incr._latest("clusters")) == _rows(full._latest("clusters"))
    # replaying the append converges (idempotent partitions, corpus
    # side of the probe excludes the batch's own prior output)
    incr.append_batch(spark, docs_odd, "b001")
    assert _rows(incr._all("text_pairs")) == _rows(full._all("text_pairs"))


def test_bucketed_band_probe_same_candidates_no_corpus_exchange(
    spark, sf_dir, tmp_path_factory
):
    """The bucketed band index must (a) produce EXACTLY the shuffle
    probe's candidate set and (b) feed the probe join from its
    bucketed layout — corpus side scans with no Exchange, so the plan
    has strictly fewer Exchanges than the shuffle path and reports the
    bucketed read."""
    from python_sql_datawarehouse_project_spark.catalog import load_table
    from python_sql_datawarehouse_project_spark.operators.dedup import (
        _doc_sketches,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = DedupIndex(
        Warehouse(spark, str(tmp_path_factory.mktemp("idx_bkt"))), "b000"
    )
    idx._ingest_docs(spark, docs.filter("doc_id % 2 = 0"), "b000", base=True)
    new_sk = _doc_sketches(docs.filter("doc_id % 2 = 1")).localCheckpoint(
        eager=True
    )

    name = idx.bucketize_bands(
        spark, str(tmp_path_factory.mktemp("bkt_tbl"))
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = idx._probe_candidates(new_sk, "b001")
        bucketed = idx.probe_corpus_bucketed(spark, name, new_sk)
        assert _rows(bucketed) == _rows(plain)
        p_plain = plain._jdf.queryExecution().executedPlan().toString()
        p_bkt = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in p_bkt, p_bkt
        assert p_bkt.count("Exchange") < p_plain.count("Exchange"), (
            p_bkt.count("Exchange"),
            p_plain.count("Exchange"),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_capped_index_base_pairs_are_dd17_grade(spark, sf_dir, tmp_path_factory):
    """capped=True (the dense-corpus production config, round 9): the
    base snapshot's pair partition must equal dd17's occupancy-capped
    gate output over the same documents — the policy applied at REST
    equals the policy applied per query."""
    from python_sql_datawarehouse_project_spark.catalog import load_table
    from python_sql_datawarehouse_project_spark.operators.dedup import (
        dd17_minhash_capped_pairs,
    )

    idx = DedupIndex(
        Warehouse(spark, str(tmp_path_factory.mktemp("idx_cap"))),
        "b000",
        capped=True,
    )
    idx.build_docs(spark, load_table(spark, sf_dir, "documents"))
    assert _rows(idx._all("text_pairs")) == _rows(
        dd17_minhash_capped_pairs(spark, sf_dir)
    )


def test_capped_bands_bound_probe_fanin(spark, sf_dir, tmp_path_factory):
    """Every (band, band_key) bucket in the capped landed index holds
    at most DD17_CAP members-or-hub rows — the invariant that bounds
    any future probe's per-key fan-in."""
    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.catalog import load_table
    from python_sql_datawarehouse_project_spark.operators.dedup import DD17_CAP

    idx = DedupIndex(
        Warehouse(spark, str(tmp_path_factory.mktemp("idx_cap2"))),
        "b000",
        capped=True,
    )
    idx.build_docs(spark, load_table(spark, sf_dir, "documents"))
    over = (
        idx._all("bands")
        .groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > DD17_CAP)
        .count()
    )
    assert over == 0


@pytest.mark.slow
def test_deferred_cluster_refresh_equals_inline(spark, sf_dir, tmp_path_factory):
    """append_batch(refresh_clusters=False) + refresh_clusters() must
    land exactly the labels the inline path writes — the verdict/
    maintenance split cannot fork lineage."""
    from python_sql_datawarehouse_project_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    even, odd = docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")

    a = DedupIndex(
        Warehouse(spark, str(tmp_path_factory.mktemp("idx_def"))), "b000"
    )
    a._ingest_docs(spark, even, "b000", base=True)
    a.append_batch(spark, odd, "b001", refresh_clusters=False)
    a.refresh_clusters(spark, "b001")

    b = DedupIndex(
        Warehouse(spark, str(tmp_path_factory.mktemp("idx_inl"))), "b000"
    )
    b._ingest_docs(spark, even, "b000", base=True)
    b.append_batch(spark, odd, "b001")

    assert _rows(a._latest("clusters")) == _rows(b._latest("clusters"))
    assert _rows(a._all("text_pairs")) == _rows(b._all("text_pairs"))
