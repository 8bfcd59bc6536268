"""WinnowIndex (plans/winnow_index.py): the persisted form of the
wn2 containment probe must equal the inline composition bit-for-bit
— at build, and after incremental appends — and per-ingest work must
touch only the batch (the ix1/EmbIngestIndex contract applied to the
span-overlap modality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_sql_datawarehouse_project_spark.catalog import load_table
from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse
from python_sql_datawarehouse_project_spark.plans.winnow_index import (
    WinnowIndex,
    winnow_contain_probe,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _roles(spark, sf_dir):
    """corpus / batch1 / batch2 role split over doc_id (deterministic,
    the dd11 convention shape)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    batch1 = docs.where(F.col("doc_id") % 10 == 0)
    batch2 = docs.where((F.col("doc_id") % 10 == 5))
    return corpus, batch1, batch2


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    return Warehouse(spark, str(tmp_path_factory.mktemp("winnow_index")))


def test_probe_equals_inline_composition(spark, sf_dir, wh):
    corpus, batch1, _ = _roles(spark, sf_dir)
    idx = WinnowIndex(wh, "b000")
    counts = idx.build_docs(spark, corpus)
    assert counts["wfp"] > 0 and counts["wdf"] > 0
    got = _rows(idx.probe(spark, batch1))
    want = _rows(winnow_contain_probe(batch1, corpus))
    assert got == want
    assert got, "role split must produce containment hits on testdata"


def test_probe_after_append_equals_union_inline(spark, sf_dir, wh):
    corpus, batch1, batch2 = _roles(spark, sf_dir)
    idx = WinnowIndex(wh, "b000")
    idx.append_batch(spark, batch1, "b001")
    got = _rows(idx.probe(spark, batch2))
    want = _rows(winnow_contain_probe(batch2, corpus.unionByName(batch1)))
    assert got == want


def test_probe_plan_has_no_corpus_shuffle_of_fp_payloads(spark, sf_dir, wh):
    """The corpus-side reads must be joined via broadcast of the
    batch's fingerprint set — assert the probe plan broadcasts on the
    index-table side instead of shuffling the full corpus index."""
    _, batch1, _ = _roles(spark, sf_dir)
    idx = WinnowIndex(wh, "b000")
    plan = idx.probe(spark, batch1)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
