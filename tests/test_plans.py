"""Physical-plan assertions: the sf-independent scale properties.

Correctness tests prove the operators compute the right answer at
small SF; these prove the PLANS are the ones that survive a 100x
scale-up (SURVEY.md §4): dims broadcast instead of shuffling the
fact, scans prune columns and accept pushed filters, the pair
operators never degrade to a cartesian/nested-loop join, and the hot
paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_sql_datawarehouse_project_spark.catalog import load_table
from python_sql_datawarehouse_project_spark.operators import analytics, dedup, quality


def plan_of(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_q1_broadcasts_dims_no_sort_merge(spark, sf_dir):
    p = plan_of(analytics.q1_monthly_sales_product(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q1_stays_in_codegen(spark, sf_dir):
    # Under AQE the compiled plan only exists after execution: run the
    # query, then assert the FINAL adaptive plan fused its stages into
    # WholeStageCodegen spans.
    df = analytics.q1_monthly_sales_product(spark, sf_dir)
    df.collect()
    p = plan_of(df)
    assert "isFinalPlan=true" in p
    assert "codegen id :" in p  # fused WholeStageCodegen stages


def test_q1_prunes_fact_columns(spark, sf_dir):
    # The monthly-sales rollup touches ~5 lineitem columns; the scan
    # must not read the rest (l_comment-class waste at 100 TB).
    p = plan_of(analytics.q1_monthly_sales_product(spark, sf_dir))
    import re

    scans = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    li = [s for s in scans if "l_quantity" in s or "l_extendedprice" in s]
    assert li, f"no lineitem scan found in plan:\n{p}"
    for s in li:
        assert "l_returnflag" not in s and "l_shipdate" not in s, s


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 10)
    p = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10" in p, p


def test_referential_probe_is_broadcast_anti_join(spark, sf_dir):
    p = plan_of(quality.qa3_referential(spark, sf_dir))
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoop" not in p


def test_dd5_never_plans_a_cartesian_pair_join(spark, sf_dir):
    # The naive all-pairs formulation plans a nested-loop/cartesian
    # join (O(n^2) rows through the interpreted expression evaluator);
    # the blocked candidates-then-verify shape must not.
    p = plan_of(dedup.dd5_embedding_neardup(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "FlatMapGroupsInPandas" in p  # the blocked BLAS stage


def test_dd3_band_join_exchanges_ids_not_sketches(spark, sf_dir):
    # The band self-join must shuffle only (doc_id, band, band_key) —
    # hs/sig payloads get re-attached after the pair dedup.
    p = plan_of(dedup.dd3_minhash_lsh_pairs(spark, sf_dir), mode="simple")
    joins = [
        seg for seg in p.splitlines() if "Join" in seg and "band_key" in seg
    ]
    assert joins, p
    for j in joins:
        assert "hs" not in j.replace("hash", "") , j


def test_batch_read_prunes_partitions(spark, sf_dir, tmp_path):
    # P4: the batch predicate must become a PartitionFilter on the
    # scan (partition pruning), not a post-scan Filter — at 100 TB
    # this is reading one batch vs reading the table.
    from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    df = load_table(spark, sf_dir, "nation")
    wh.write_batch(df, "bronze", "nation", "BATCH000001")
    wh.write_batch(df, "bronze", "nation", "BATCH000002")
    p = plan_of(wh.read_batch("bronze", "nation", "BATCH000002"))
    assert "PartitionFilters: [isnotnull(dwh_batch_id" in p, p
    assert "dwh_batch_id#" in p.split("PartitionFilters", 1)[1].split("]", 1)[0]
