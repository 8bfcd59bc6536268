"""Scale-factor parity sweep: replay the registry against DuckDB at
an arbitrary SF directory, with the two declared scale policies
applied automatically:

  * registry.HASHED_AT_SCALE  -> testing.compare_hashed (in-engine
    count + md5 hash-sum on both sides; no driver-side rows)
  * registry.HEAVY_ORACLE_SF1 -> skipped (the DuckDB oracle, not the
    Spark operator, is the thing that does not scale; every member
    was probed with an explicit timeout — see the registry comment)

Writes the ORACLECHECK_sf1_r*.json artifact shape: one record per
gate plus a __meta__ block declaring exactly what was skipped and
why, so the artifact is self-describing.

Usage:
    python scripts/oraclecheck_sf.py --sf-dir /root/repo/.scratch/sf1 \
        --json-out ORACLECHECK_sf1_r07.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Spark-side engine caps that abort AT SCALE by documented design —
# the sweep skips these and records the reason.  EMPTY since round 9:
# q43's former entry was retired when VERDICT r8 #6 was executed —
# spark.sql.cteRecursionRowLimit is a conf, not a wall.  Measured at
# sf1 (round 9): default 1,000,000 reproduces the documented abort;
# raised, the native recursion completes 7,064,790 chain rows in
# 9.3 s / 3.5 GB JVM heap and the full DuckDB oracle hash-matches.
# The sweep now raises the conf around q43 via GATE_CONF_OVERRIDES.
SKIP_SPARK_CAP_SF1: dict[str, str] = {}

# Per-gate session-conf overrides, set before the gate and restored
# after — for gates whose AT-SCALE run needs a non-default engine
# knob that must not leak into the rest of the sweep.
GATE_CONF_OVERRIDES = {
    # ~7M chain rows at sf1, ~70M at sf10: give the working-table
    # 200M headroom (the limit is a row-count guardrail, not memory —
    # 3.5 GB heap measured at sf1's 7M rows).
    "q43_recursive_sql": {"spark.sql.cteRecursionRowLimit": "200000000"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--json-out")
    ap.add_argument(
        "--include-heavy",
        action="store_true",
        help="also replay HEAVY_ORACLE_SF1 gates (bring patience)",
    )
    ap.add_argument(
        "--only",
        help="comma-separated gate subset (operational reruns)",
    )
    ap.add_argument(
        "--exclude",
        help="comma-separated extra skips, recorded in __meta__ as "
        "skipped_operator (use with a measured reason in the notes)",
    )
    args = ap.parse_args()

    from python_sql_datawarehouse_project_spark import registry
    from python_sql_datawarehouse_project_spark.session import build_session
    from python_sql_datawarehouse_project_spark.testing import (
        compare,
        compare_hashed,
    )

    spark = build_session(app_name="oraclecheck-sf")
    spark.sparkContext.setLogLevel("ERROR")
    gates, oracles = registry.queries(), registry.oracles()
    skipped = [] if args.include_heavy else sorted(
        k for k in gates if k in registry.HEAVY_ORACLE_SF1
    )
    capped = sorted(k for k in gates if k in SKIP_SPARK_CAP_SF1)
    extra = sorted(
        k for k in (args.exclude or "").split(",") if k and k in gates
    )
    names = [
        k
        for k in sorted(gates)
        if k not in skipped and k not in capped and k not in extra
    ]
    if args.only:
        only = {k for k in args.only.split(",") if k}
        unknown = only - set(gates)
        if unknown:
            ap.error(f"unknown gates in --only: {sorted(unknown)}")
        # --only is an explicit operator request: it overrides the
        # policy skip lists (HEAVY_ORACLE_SF1 / engine caps / --exclude)
        # instead of intersecting with their survivors — otherwise
        # `--only dd7_dup_clusters` without --include-heavy silently
        # runs zero gates and exits 0 looking green (ADVICE r7).
        overridden = sorted(only & set(skipped + capped + extra))
        if overridden:
            print(
                f"oracle-check: --only overrides skip lists for {overridden}",
                file=sys.stderr,
            )
        names = sorted(only)

    n_fail = 0
    records: dict[str, dict] = {}
    for name in names:
        hashed = name in registry.HASHED_AT_SCALE
        cmp_fn = compare_hashed if hashed else compare
        overrides = GATE_CONF_OVERRIDES.get(name, {})
        saved = {k: spark.conf.get(k) for k in overrides}
        for k, v in overrides.items():
            spark.conf.set(k, v)
        t0 = time.perf_counter()
        try:
            r = cmp_fn(name, gates[name], oracles[name], spark, args.sf_dir)
            ok = r.ok
            rec = {
                # On compare_hashed's early schema-mismatch return both
                # counts are -1 sentinels; don't record a vacuous
                # rows_match=true for a gate whose counts were never
                # computed (ADVICE r7).
                "rows_match": r.spark_rows >= 0 and r.spark_rows == r.oracle_rows,
                "schema_match": r.columns_match and r.types_match,
                "hash_match": r.values_match,
                "spark_rows": r.spark_rows,
                "oracle_rows": r.oracle_rows,
                "err": None if ok else "; ".join(r.mismatches[:3]),
            }
        except Exception as ex:  # noqa: BLE001 — report and continue
            ok = False
            rec = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(ex).__name__}: {ex}"[:300],
            }
        for k, v in saved.items():
            spark.conf.set(k, v)
        if hashed:
            rec["hashed"] = True
        if overrides:
            rec["conf_overrides"] = overrides
        rec["sec"] = round(time.perf_counter() - t0, 1)
        records[name] = rec
        n_fail += 0 if ok else 1
        if args.json_out:
            # checkpoint after every gate: a killed run (wedged gate,
            # host reboot) keeps its completed records
            with open(args.json_out, "w") as f:
                json.dump(records, f, indent=1)
        tag = " [hashed]" if hashed else ""
        print(
            ("OK  " if ok else "FAIL")
            + f" {name}{tag} ({rec['sec']}s)"
            + ("" if ok else f" {rec['err']}"),
            flush=True,
        )
    print(f"oracle-check: {len(names) - n_fail}/{len(names)} OK")
    if args.json_out:
        records["__meta__"] = {
            "sf_dir": args.sf_dir,
            "n_ok": len(names) - n_fail,
            "n_total": len(names),
            # a targeted run (--only) is NOT a full sweep — record the
            # requested scope so the artifact self-describes
            "only": sorted(args.only.split(",")) if args.only else None,
            "hashed_gates": sorted(
                k for k in names if k in registry.HASHED_AT_SCALE
            ),
            "skipped_heavy_oracle": skipped,
            "skipped_spark_engine_cap": {
                k: SKIP_SPARK_CAP_SF1[k] for k in capped
            },
            "skipped_operator": extra,
            "note": "hashed gates compared via in-engine count+md5 "
            "hash-sum (testing.compare_hashed); heavy skips are "
            "oracle-side cost only — see registry.HEAVY_ORACLE_SF1",
        }
        with open(args.json_out, "w") as f:
            json.dump(records, f, indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
