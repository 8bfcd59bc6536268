"""Batch ingestion orchestrator — the Spark analogue of the
reference's `batch_processing.py <client> start` pipeline (SURVEY.md
§3.1), collapsed from five subprocess launches per file into one
driver program of lazy DataFrame transforms.

Per-file lifecycle (statuses land in the run log, which replaces both
the file_audit_log rows and the incoming/success/failed file moves):

  discover -> V1 config match   (no match -> CONFIG_FAILED, quarantine)
  read                          (S1-S4 by configured extension)
  V2 mapping validation         (mismatch -> MAPPING_FAILED, stop file)
  V3 row validation             (failures logged, NON-FATAL — the
                                 reference warns and proceeds,
                                 batch_processing.py:1209-1220)
  P1-P3 projection + batch stamp
  bronze write                  (idempotent batch-partition overwrite)

Batch ids are the reference's BATCH + 6-digit counter.  Re-running a
batch overwrites exactly its partitions (delete-then-insert
semantics); the three reference modes map as: start = new batch id,
restart/reprocessing = rerun same batch id (identical effect here
because conversion isn't a separate persisted stage).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..sources.mapping import ColumnMapping, apply_mapping
from ..sources.readers import read_source
from ..sources.validation import (
    SourceConfig,
    match_config,
    validate_mapping,
    validate_rows,
)
from .runlog import RunLog
from .warehouse import Warehouse


@dataclass
class FileResult:
    file: str
    status: str  # LOADED | CONFIG_FAILED | MAPPING_FAILED | READ_FAILED
    target_table: str | None = None
    rows: int = 0
    detail: str | None = None


@dataclass
class IngestPlan:
    """Per-client ingest config: the tools.client_config +
    column_mapping + required_columns tables as plain data."""

    configs: list[SourceConfig]
    mappings: dict[str, list[ColumnMapping]]  # target_table -> mapping
    required: dict[str, list[str]] = field(default_factory=dict)


def ingest_directory(
    spark: SparkSession,
    wh: Warehouse,
    log: RunLog,
    plan: IngestPlan,
    incoming_dir: str,
    source_system: str,
    batch_id: str,
) -> list[FileResult]:
    results: list[FileResult] = []
    for fname in sorted(os.listdir(incoming_dir)):
        path = os.path.join(incoming_dir, fname)
        if not os.path.isfile(path):
            continue
        cfg = match_config(fname, source_system, plan.configs)
        if cfg is None:
            results.append(FileResult(fname, "CONFIG_FAILED"))
            log.append(
                "file_audit_log",
                batch_id=batch_id,
                physical_file_name=fname,
                config_validation_status="FAILED",
            )
            continue
        mappings = plan.mappings[cfg.target_table]
        try:
            df = read_source(spark, path, cfg.extension)
        except Exception as e:
            results.append(
                FileResult(fname, "READ_FAILED", cfg.target_table, 0, str(e))
            )
            log.append(
                "load_error_log",
                batch_id=batch_id,
                physical_file_name=fname,
                message=str(e),
            )
            continue

        mv = validate_mapping(df, [m.source for m in mappings])
        log.append(
            "mapping_validation_log",
            batch_id=batch_id,
            physical_file_name=fname,
            status="SUCCESS" if mv.ok else "FAILED",
            missing=",".join(mv.missing),
            extra=",".join(mv.extra),
        )
        if not mv.ok:
            results.append(
                FileResult(
                    fname,
                    "MAPPING_FAILED",
                    cfg.target_table,
                    0,
                    f"missing={mv.missing} extra={mv.extra}",
                )
            )
            continue

        req = plan.required.get(cfg.target_table, [])
        if req:
            # required columns are TARGET names; check them post-projection
            projected = apply_mapping(df, mappings)
            rv = validate_rows(projected, req)
            log.append(
                "row_validation_log",
                batch_id=batch_id,
                physical_file_name=fname,
                status="SUCCESS" if rv.ok else "FAILED",
                total_rows=rv.total_rows,
                null_counts=rv.null_counts,
                duplicate_rows=rv.duplicate_rows,
            )
            # non-fatal by contract: continue loading either way

        out = apply_mapping(df, mappings, batch_id=batch_id).drop("dwh_batch_id")
        n = wh.write_batch(out, "bronze", cfg.target_table, batch_id)
        log.append(
            "file_audit_log",
            batch_id=batch_id,
            physical_file_name=fname,
            config_validation_status="SUCCESS",
            load_status="SUCCESS",
            total_rows=n,
        )
        results.append(FileResult(fname, "LOADED", cfg.target_table, n))
    return results
