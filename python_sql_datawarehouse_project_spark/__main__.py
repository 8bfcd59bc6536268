"""CLI dispatch — the reference's entry-point contract on Spark.

Reference: `python batch_processing.py <client> <mode>` parses
(client, mode) and, with NO arguments, runs `start` for every client
in tools.client_reference (batch_processing.py:1276-1296).  Here:

    python -m python_sql_datawarehouse_project_spark <client> [mode]
    python -m python_sql_datawarehouse_project_spark            # all clients

Modes: start | restart | reprocessing (plans/clients.py documents the
mapping onto the batch-overwrite model).  The warehouse root comes
from --root (default ./warehouse_data) and holds the client registry
JSON plus each client's isolated warehouse/log directories.

One driver program replaces the reference's five subprocess launches
per file and its manifest-file IPC rendezvous: every step is a
DataFrame transformation inside this session (SURVEY.md §3.1).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m python_sql_datawarehouse_project_spark",
        description="Run the medallion batch pipeline for one or all clients.",
    )
    ap.add_argument("client", nargs="?", help="client schema; omit for all")
    ap.add_argument(
        "mode",
        nargs="?",
        default="start",
        choices=("start", "restart", "reprocessing"),
    )
    ap.add_argument("--root", default="warehouse_data")
    args = ap.parse_args(argv)

    from .plans.clients import ClientRegistry, process_client, run_all_clients
    from .session import build_session

    spark = build_session(app_name="python_sql_datawarehouse_project_spark-cli")
    registry = ClientRegistry(args.root)
    if args.client is None:
        results = run_all_clients(spark, registry)
    else:
        results = [process_client(spark, registry, args.client, args.mode)]
    for r in results:
        statuses = {
            step: {
                t: ("SUCCESS" if s[0] else "FAILED")
                for t, s in layers.items()
            }
            for step, layers in r.results.items()
        }
        print(f"{r.client_schema} {r.batch_id}: {statuses}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
