"""Ingestion & validation layer tests (SURVEY.md §2.1-2.2, §2.11):
readers, mapping projection with the id-cast heuristic, the
cst_gendr -> cst_gndr rename the reference's real data depends on,
V1-V4 validation semantics, and the end-to-end directory ingest."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from python_sql_datawarehouse_project_spark.plans.ingest import (
    IngestPlan,
    ingest_directory,
)
from python_sql_datawarehouse_project_spark.plans.runlog import RunLog
from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse
from python_sql_datawarehouse_project_spark.sources.mapping import (
    ColumnMapping,
    apply_mapping,
    normalize_name,
)
from python_sql_datawarehouse_project_spark.sources.readers import (
    UnsupportedSourceError,
    read_source,
)
from python_sql_datawarehouse_project_spark.sources.validation import (
    SourceConfig,
    match_config,
    validate_mapping,
    validate_rows,
    validate_target_schema,
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "cust_info_BATCH000001.csv"
    p.write_text(
        "cst_id,cst_key,cst_gendr,amount\n"
        "1.0,K1,F,10.5\n"
        "2.0,K2,M,20.25\n"
        ",K3,,30.0\n"  # null id, blank gender
        "2.0,K2,M,20.25\n"  # exact dup of row 2
    )
    return str(p)


MAPPINGS = [
    ColumnMapping("cst_id", "cst_id", "integer"),
    ColumnMapping("cst_key", "cst_key", "string"),
    ColumnMapping("cst_gendr", "cst_gndr", "string"),  # genuine rename
    ColumnMapping("amount", "amount", "numeric"),
]


# -- readers ----------------------------------------------------------
def test_csv_reader_infers(spark, csv_file):
    df = read_source(spark, csv_file, "csv")
    assert df.columns == ["cst_id", "cst_key", "cst_gendr", "amount"]
    assert df.count() == 4


def test_json_reader_lines_and_whole_doc(spark, tmp_path):
    lines = tmp_path / "d.json"
    lines.write_text('{"a": 1}\n{"a": 2}\n')
    assert read_source(spark, str(lines), "json").count() == 2
    whole = tmp_path / "w.json"
    whole.write_text(json.dumps([{"a": 1}, {"a": 2}, {"a": 3}]))
    assert read_source(spark, str(whole), "json").count() == 3


def test_unknown_format_raises(spark):
    with pytest.raises(UnsupportedSourceError):
        read_source(spark, "/nonexistent", "avro")


# -- mapping projection (P1-P3) --------------------------------------
def test_mapping_rename_and_id_cast(spark, csv_file):
    df = read_source(spark, csv_file, "csv")
    out = apply_mapping(df, MAPPINGS, batch_id="BATCH000042")
    assert out.columns == ["cst_id", "cst_key", "cst_gndr", "amount", "dwh_batch_id"]
    rows = {r.cst_key: r for r in out.collect()}
    # P2: inference-mangled double ids -> clean longs
    assert rows["K1"].cst_id == 1 and isinstance(rows["K1"].cst_id, int)
    assert rows["K3"].cst_id is None
    # P3: batch stamp on every row
    assert all(r.dwh_batch_id == "BATCH000042" for r in rows.values())


def test_mapping_matches_normalized_headers(spark):
    df = spark.createDataFrame([(1, "x")], [" Cst ID ", "CST KEY"])
    out = apply_mapping(
        df,
        [ColumnMapping("cst_id", "cst_id", "int"),
         ColumnMapping("cst_key", "cst_key", "string")],
    )
    assert out.columns == ["cst_id", "cst_key"]
    assert normalize_name("  Cst  Gendr ") == "cst_gendr"


# -- V1 config match --------------------------------------------------
CONFIGS = [
    SourceConfig("crm", "csv", "cust_info", "crm_cust_info"),
    SourceConfig("erp", "csv", "loc_a101", "erp_loc_a101"),
]


def test_config_match_and_quarantine():
    assert match_config("cust_info_BATCH000001.csv", "crm", CONFIGS).target_table == "crm_cust_info"
    assert match_config("cust_info_BATCH000001.csv", "erp", CONFIGS) is None
    assert match_config("unknown.csv", "crm", CONFIGS) is None
    assert match_config("cust_info.parquet", "crm", CONFIGS) is None


# -- V2 mapping validation -------------------------------------------
def test_mapping_validation_reports_missing_and_extra(spark):
    df = spark.createDataFrame([(1, "a")], ["cst_id", "surprise"])
    mv = validate_mapping(df, ["cst_id", "cst_key"])
    assert not mv.ok
    assert mv.missing == ["cst_key"] and mv.extra == ["surprise"]


# -- V3 row validation ------------------------------------------------
def test_row_validation_nulls_and_dups(spark, csv_file):
    df = read_source(spark, csv_file, "csv")
    out = apply_mapping(df, MAPPINGS)
    rv = validate_rows(out, ["cst_id", "cst_gndr"])
    assert not rv.ok
    assert rv.total_rows == 4
    assert rv.null_counts == {"cst_id": 1, "cst_gndr": 1}
    assert rv.duplicate_rows == 1  # the repeated (2, m) key


def test_row_validation_nan_detected(spark):
    df = spark.createDataFrame([(float("nan"),), (1.0,)], "x double")
    rv = validate_rows(df, ["x"])
    assert rv.null_counts == {"x": 1}


# -- V4 target schema -------------------------------------------------
def test_target_schema_validation():
    schema = StructType.fromDDL("cst_id INT, cst_key STRING")
    assert validate_target_schema(["cst_id", "cst_key"], schema) == []
    assert validate_target_schema(["cst_id", "ghost"], schema) == ["ghost"]


# -- end-to-end directory ingest -------------------------------------
def test_ingest_directory_end_to_end(spark, tmp_path, csv_file):
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    os.link(csv_file, incoming / os.path.basename(csv_file))
    (incoming / "mystery_file.csv").write_text("a,b\n1,2\n")

    wh = Warehouse(spark, str(tmp_path / "wh"))
    log = RunLog(str(tmp_path / "wh"))
    plan = IngestPlan(
        configs=CONFIGS,
        mappings={"crm_cust_info": MAPPINGS},
        required={"crm_cust_info": ["cst_id"]},
    )
    results = ingest_directory(
        spark, wh, log, plan, str(incoming), "crm", "BATCH000007"
    )
    by_file = {r.file: r for r in results}
    assert by_file["mystery_file.csv"].status == "CONFIG_FAILED"
    loaded = by_file["cust_info_BATCH000001.csv"]
    assert loaded.status == "LOADED" and loaded.rows == 4

    bronze = wh.read_batch("bronze", "crm_cust_info", "BATCH000007")
    assert bronze.count() == 4
    assert bronze.filter(F.col("cst_gndr") == "F").count() == 1
    # audit + row-validation rows landed
    statuses = {r["physical_file_name"]: r for r in log.read("file_audit_log")}
    assert statuses["mystery_file.csv"]["config_validation_status"] == "FAILED"
    assert statuses["cust_info_BATCH000001.csv"]["load_status"] == "SUCCESS"
    rv = log.read("row_validation_log")[0]
    assert rv["status"] == "FAILED" and rv["duplicate_rows"] == 1  # non-fatal


def test_excel_reader_gated_or_works(spark, tmp_path):
    # S2: no core Spark Excel reader — the driver-side pandas bridge
    # either reads the first sheet or raises the typed gate error
    # when no xlsx engine is installed in the environment.
    import pandas as pd

    from python_sql_datawarehouse_project_spark.sources.readers import (
        UnsupportedSourceError,
        read_source,
    )

    p = str(tmp_path / "t.xlsx")
    try:
        pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_excel(p, index=False)
    except (ImportError, ModuleNotFoundError):
        # No xlsx engine in this environment: the reader must raise
        # the typed gate error on an existing (placeholder) file.
        (tmp_path / "t.xlsx").write_bytes(b"PK")
        with pytest.raises(UnsupportedSourceError):
            read_source(spark, p, "xlsx")
        return
    df = read_source(spark, p, "xlsx")
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_schema_only_read_is_metadata(spark, sf_dir):
    # S5: column listing without a data scan (parquet footer only).
    from python_sql_datawarehouse_project_spark.sources.readers import read_schema

    cols = read_schema(spark, f"{sf_dir}/nation.parquet", "parquet")
    assert cols == ["n_nationkey", "n_name", "n_regionkey"]
