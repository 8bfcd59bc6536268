"""Multi-client orchestration: two registered clients run the full
medallion pass with fully isolated state (per-client schemas in the
reference, per-client sub-roots here) and independent batch counters
(reference batch_processing.py:1276-1296 runs `start` for every
client_reference row when invoked with no args)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from python_sql_datawarehouse_project_spark.plans.clients import (
    ClientRegistry,
    process_client,
    run_all_clients,
)


@pytest.fixture(scope="module")
def two_client_run(spark, tmp_path_factory):
    from test_medallion import _seed_bronze

    root = str(tmp_path_factory.mktemp("clients"))
    reg = ClientRegistry(root)
    reg.register("client1", client_name="Client One")
    reg.register("client2", client_name="Client Two")

    wh1 = reg.warehouse(spark, "client1")
    wh2 = reg.warehouse(spark, "client2")
    _seed_bronze(spark, wh1)
    _seed_bronze(spark, wh2)
    # client2 gets one extra clean customer -> its dims must differ
    extra = spark.createDataFrame(
        [(7.0, "AW00011007", "Eve", "Kim", "S", "F", dt.date(2022, 2, 2))],
        "cst_id double, cst_key string, cst_firstname string, "
        "cst_lastname string, cst_marital_status string, cst_gndr string, "
        "cst_create_date date",
    )
    base = wh2.read_batch("bronze", "crm_cust_info", "BATCH000001").drop(
        "dwh_batch_id"
    )
    wh2.write_batch(base.unionByName(extra), "bronze", "crm_cust_info", "BATCH000001")

    results = run_all_clients(spark, reg)
    return root, reg, results


def test_all_clients_processed_in_id_order(two_client_run):
    _, _, results = two_client_run
    assert [r.client_schema for r in results] == ["client1", "client2"]
    for r in results:
        assert r.batch_id == "BATCH000001"
        for stage, procs in r.results.items():
            for name, (ok, err, _) in procs.items():
                assert ok, f"{r.client_schema} {stage}.{name}: {err}"


def test_client_state_is_isolated(spark, two_client_run):
    _, reg, _ = two_client_run
    d1 = reg.warehouse(spark, "client1").read_batch(
        "gold", "dim_customers", "BATCH000001"
    )
    d2 = reg.warehouse(spark, "client2").read_batch(
        "gold", "dim_customers", "BATCH000001"
    )
    assert d1.count() == 3  # null pk dropped, dup collapsed
    assert d2.count() == 4  # the extra client2-only customer
    # separate physical roots, separate log files
    assert reg.client_root("client1") != reg.client_root("client2")
    for schema in ("client1", "client2"):
        assert os.path.exists(
            os.path.join(reg.client_root(schema), "tools", "job_execution_log.jsonl")
        )


def test_batch_counters_advance_independently(spark, two_client_run):
    _, reg, _ = two_client_run
    assert reg.get("client1").last_batch_id == "BATCH000001"
    r = process_client(spark, reg, "client1", "start")
    assert r.batch_id == "BATCH000002"
    assert reg.get("client1").last_batch_id == "BATCH000002"
    assert reg.get("client2").last_batch_id == "BATCH000001"  # untouched


@pytest.mark.slow
def test_restart_reruns_last_batch(spark, two_client_run):
    _, reg, _ = two_client_run
    before = reg.get("client2").last_batch_id
    r = process_client(spark, reg, "client2", "restart")
    assert r.batch_id == before  # idempotent re-run, no new counter


def test_unknown_client_raises(two_client_run):
    _, reg, _ = two_client_run
    with pytest.raises(KeyError, match="client9"):
        reg.get("client9")


def test_file_driven_client_run_and_reprocessing(spark, tmp_path):
    """The full reference driver shape: files land in an incoming dir,
    `start` ingests them into bronze and runs the transforms;
    `reprocessing` re-runs the SAME batch from the landed bronze
    without touching the incoming dir (batch_processing.py:776-860)."""
    from python_sql_datawarehouse_project_spark.plans.clients import ClientSources
    from python_sql_datawarehouse_project_spark.plans.ingest import IngestPlan
    from python_sql_datawarehouse_project_spark.sources.mapping import ColumnMapping
    from python_sql_datawarehouse_project_spark.sources.validation import SourceConfig

    incoming = tmp_path / "raw" / "c3" / "crm" / "incoming"
    incoming.mkdir(parents=True)
    (incoming / "cust_info_BATCH000001.csv").write_text(
        "cst_id,cst_key,cst_firstname,cst_lastname,cst_marital_status,"
        "cst_gndr,cst_create_date\n"
        "1.0,K1,Ann,Lee,M,F,2024-01-01\n"
        "2.0,K2,Bob,Ray,S,M,2024-02-02\n"
    )
    sources = ClientSources(
        plan=IngestPlan(
            configs=[SourceConfig("crm", "csv", "cust_info", "crm_cust_info")],
            mappings={
                "crm_cust_info": [
                    ColumnMapping(c, c, t)
                    for c, t in [
                        ("cst_id", "integer"),
                        ("cst_key", "string"),
                        ("cst_firstname", "string"),
                        ("cst_lastname", "string"),
                        ("cst_marital_status", "string"),
                        ("cst_gndr", "string"),
                        ("cst_create_date", "date"),
                    ]
                ]
            },
            required={"crm_cust_info": ["cst_id"]},
        ),
        incoming={"crm": str(incoming)},
    )
    reg = ClientRegistry(str(tmp_path / "wh"))
    reg.register("c3")
    r = process_client(spark, reg, "c3", "start", sources)
    assert [f.status for f in r.ingested] == ["LOADED"]
    assert r.batch_id == "BATCH000001"
    wh = reg.warehouse(spark, "c3")
    assert wh.read_batch("bronze", "crm_cust_info", r.batch_id).count() == 2
    assert wh.read_batch("silver", "crm_cust_info", r.batch_id).count() == 2

    # reprocessing: same batch, ingest skipped, transforms re-run
    (incoming / "cust_info_BATCH000001.csv").unlink()  # dir now empty
    r2 = process_client(spark, reg, "c3", "reprocessing", sources)
    assert r2.batch_id == r.batch_id and r2.ingested == []
    assert wh.read_batch("silver", "crm_cust_info", r2.batch_id).count() == 2
    for name, (ok, err, _) in r2.results["silver"].items():
        assert ok, f"{name}: {err}"


def test_registry_persists_across_instances(two_client_run):
    root, reg, _ = two_client_run
    reloaded = ClientRegistry(root)
    assert [c.client_schema for c in reloaded.all()] == ["client1", "client2"]
    assert (
        reloaded.get("client1").last_batch_id == reg.get("client1").last_batch_id
    )


@pytest.mark.slow
def test_cli_dispatch_runs_single_client(spark, tmp_path, capsys):
    # The reference CLI contract (batch_processing.py:1276-1296):
    # `<client> <mode>` runs one client; main() reuses the active
    # session and prints one status line per run.
    from test_medallion import _seed_bronze

    from python_sql_datawarehouse_project_spark.__main__ import main
    from python_sql_datawarehouse_project_spark.plans.clients import ClientRegistry

    root = str(tmp_path / "cli_root")
    reg = ClientRegistry(root)
    reg.register("cli_client", client_name="CLI Client")
    _seed_bronze(spark, reg.warehouse(spark, "cli_client"))

    rc = main(["cli_client", "start", "--root", root])
    assert rc == 0
    out = capsys.readouterr().out
    assert "cli_client BATCH000001" in out
    assert "FAILED" not in out
    # batch counter persisted: a second start allocates BATCH000002
    rc = main(["cli_client", "start", "--root", root])
    assert rc == 0
    assert "cli_client BATCH000002" in capsys.readouterr().out


def test_cli_gate_and_list(spark, sf_dir, capsys):
    # --list-gates needs no Spark session; --gate runs one registry
    # query against --sf-dir and prints rows.
    from python_sql_datawarehouse_project_spark.__main__ import main

    assert main(["--list-gates"]) == 0
    out = capsys.readouterr().out
    assert "q34_forecast_revenue" in out and "dd7_dup_clusters" in out
    assert main(["--gate", "q34_forecast_revenue", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "forecast_revenue" in out


def test_cli_oracle_check_single_gate(spark, sf_dir, capsys):
    # --oracle-check --gate replays one gate against its DuckDB oracle
    # (exit 0 on hash match, 1 on any FAIL) — the driver's gate as a
    # CLI, runnable at any SF dir.
    from python_sql_datawarehouse_project_spark.__main__ import main

    assert (
        main(
            [
                "--oracle-check",
                "--gate",
                "qa20_grouped_regression",
                "--sf-dir",
                sf_dir,
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "OK   qa20_grouped_regression" in out
    assert "oracle-check: 1/1 OK" in out
