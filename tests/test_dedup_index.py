"""DedupIndex: the persisted candidate/cluster index must feed cs1,
dd13 and dd7 results BIT-IDENTICAL to the inline oracled gates
(VERDICT r5 "Next round" #3 — done = pytest showing index-fed
cs1/dd13 equal the inline gates bit-for-bit)."""

from __future__ import annotations

import pytest

from python_sql_datawarehouse_project_spark.operators.dedup import (
    cs1_canonical_selection,
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


def test_index_fed_dd13_equals_inline_gate(spark, sf_dir, idx):
    assert _rows(idx.dd13_ensemble_agreement()) == _rows(
        dd13_ensemble_agreement(spark, sf_dir)
    )


def test_index_fed_dd7_equals_inline_gate(spark, sf_dir, idx):
    assert _rows(idx.dd7_dup_clusters()) == _rows(
        dd7_dup_clusters(spark, sf_dir)
    )


def test_rebuild_is_idempotent(spark, sf_dir, idx):
    before = _rows(idx.dd13_ensemble_agreement())
    counts = idx.build(spark, sf_dir)  # same snapshot, same batch_id
    assert counts["text_pairs"] > 0
    assert _rows(idx.dd13_ensemble_agreement()) == before
