"""Batch orchestrator: the Spark analogue of the reference's three
driver scripts (silver_clean_transform.py, gold_integration.py,
refresh_mv.py — SURVEY.md §3.2), collapsed into one in-process plan.

Lifecycle per batch:
  run_silver  -> every silver transform, logged to transformation_log
  run_gold    -> dims first, then facts gated on dim SUCCESS rows
                 (integration_dependencies semantics; SKIPPED rows are
                 logged exactly like gold_integration.py:276-290)
  run_mvs     -> FULL refresh of each registered MV, mv_refresh_log
                 (or mode="incremental": fold-the-batch state merge
                 for the six maintainable MVs, history recompute for
                 the three order-dependent ones)

Batch IDs follow the reference's "BATCH" + 6-digit counter
(batch_processing.py:49-56).
"""

from __future__ import annotations

from .gold import DEPENDENCIES, INTEGRATIONS
from .mv import MVS, refresh_mv
from .mv_incremental import INCREMENTAL, refresh_mv_incremental
from .runlog import RunLog
from .silver import TRANSFORMS
from .warehouse import Warehouse


def next_batch_id(last: str | None) -> str:
    """BATCH###### counter (reference batch_processing.py:49-56)."""
    n = int(last.removeprefix("BATCH")) if last else 0
    return f"BATCH{n + 1:06d}"


def run_silver(wh: Warehouse, log: RunLog, batch_id: str) -> dict[str, tuple]:
    results = {}
    for name, fn in TRANSFORMS.items():
        ok, err, n = fn(wh, batch_id)
        results[name] = (ok, err, n)
        log.append(
            "transformation_log",
            proc_name=name,
            batch_id=batch_id,
            status="SUCCESS" if ok else "FAILED",
            record_count=n,
            message=err,
        )
    return results


def run_gold(wh: Warehouse, log: RunLog, batch_id: str) -> dict[str, tuple]:
    """Dims before facts; facts skipped unless all deps SUCCESS."""
    results = {}
    ordered = sorted(
        INTEGRATIONS, key=lambda k: (k in DEPENDENCIES, k)
    )  # no-dep (dims) first, then dependent (facts)
    for name in ordered:
        deps = DEPENDENCIES.get(name, ())
        done = log.successes("integration_log", batch_id)
        missing = [d for d in deps if d not in done]
        if missing:
            results[name] = (False, f"SKIPPED: deps not satisfied {missing}", 0)
            log.append(
                "integration_log",
                proc_name=name,
                batch_id=batch_id,
                status="SKIPPED",
                record_count=0,
                message=f"dependencies not satisfied: {missing}",
            )
            continue
        ok, err, n = INTEGRATIONS[name](wh, batch_id)
        results[name] = (ok, err, n)
        log.append(
            "integration_log",
            proc_name=name,
            batch_id=batch_id,
            status="SUCCESS" if ok else "FAILED",
            record_count=n,
            message=err,
        )
    return results


def run_mvs(
    wh: Warehouse,
    log: RunLog,
    batch_id: str,
    mode: str = "full",
    prev_batch_id: str | None = None,
) -> dict[str, tuple]:
    """Refresh all nine MVs for `batch_id`.

    mode="full" (default, reference-faithful: refresh_mode='FULL' at
    materialized_view.sql:161-169) recomputes each MV over the batch.

    mode="incremental" is the scale path a 100 TB deployment runs:
    the six incrementally-maintainable MVs fold ONLY the new gold
    batch into their partial-aggregate state (cost proportional to the
    batch + group cardinality, never the fact history); the three
    order-dependent MVs (mv_incremental.FULL_ONLY) are recomputed
    over full history, which is their only correct definition.
    `prev_batch_id` names the state snapshot to build on; when None
    each MV resolves its OWN latest completed snapshot (marker files,
    mv_incremental.resolve_prev_state) and folds in any gold batches
    no snapshot has covered — so an MV with a legitimately-empty
    first delta, or one newly added to INCREMENTAL on a warehouse
    with history, rebuilds correctly instead of silently restarting
    state from the current batch (ADVICE r9).

    Semantics note: incremental mode produces `refresh_mv(...,
    history=True)` semantics — each MV over FULL warehouse history as
    of `batch_id`.  That matches mode="full" only while the warehouse
    holds a single batch; with more batches loaded, mode="full"
    (reference-faithful) computes each MV over the named batch alone,
    so the two modes legitimately differ.  The parity pytest
    (tests/test_mv_incremental.py) pins incremental == full-HISTORY
    recompute bitwise, not == mode="full" output.

    mode="incremental_approx" is incremental with ONE substitution:
    mv_customer_lifetime_value maintains qa22-style HLL registers at
    customer grain instead of exact (customer, order)-grain state
    (mv_incremental.refresh_mv_incremental_approx) — order_count
    becomes an estimate (error pytest-bounded), lifetime_value stays
    exact, and the dominant incremental state cost drops from order
    cardinality to customer cardinality.
    """
    from .mv_incremental import APPROX, refresh_mv_incremental_approx

    incremental = mode in ("incremental", "incremental_approx")
    results = {}
    for name in MVS:
        if incremental and name in INCREMENTAL:
            try:
                if mode == "incremental_approx" and name in APPROX:
                    _, n = refresh_mv_incremental_approx(
                        wh, name, batch_id, prev_batch_id=prev_batch_id
                    )
                else:
                    _, n = refresh_mv_incremental(
                        wh, name, batch_id, prev_batch_id=prev_batch_id
                    )
                ok, err = True, None
            except Exception as e:  # logged like the FULL path's failures
                ok, err, n = False, str(e), 0
        elif incremental:
            ok, err, n = refresh_mv(wh, name, batch_id, history=True)
        else:
            ok, err, n = refresh_mv(wh, name, batch_id)
        results[name] = (ok, err, n)
        log.append(
            "mv_refresh_log",
            proc_name=name,
            batch_id=batch_id,
            status="SUCCESS" if ok else "FAILED",
            record_count=n,
            message=err if err else f"mode={mode}",
        )
    return results


def run_batch(
    wh: Warehouse,
    log: RunLog,
    batch_id: str,
    mv_mode: str = "full",
    prev_batch_id: str | None = None,
) -> dict[str, dict]:
    """Full silver -> gold -> MV pass for one batch (the reference's
    three CLI entry points chained, minus the manifest file dance).
    `mv_mode`/`prev_batch_id` route the MV stage (see run_mvs)."""
    silver = run_silver(wh, log, batch_id)
    gold = run_gold(wh, log, batch_id)
    mvs = run_mvs(wh, log, batch_id, mode=mv_mode, prev_batch_id=prev_batch_id)
    status = (
        "SUCCESS"
        if all(ok for ok, *_ in [*silver.values(), *gold.values(), *mvs.values()])
        else "FAILED"
    )
    log.append("job_execution_log", batch_id=batch_id, status=status)
    return {"silver": silver, "gold": gold, "mv": mvs}
