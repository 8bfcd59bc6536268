"""Verification provenance per registry query.

The round driver writes ``CORRECTNESS_r{N}.json`` at the repo root
with one row per checked query (rows/schema/value-hash vs the DuckDB
oracle at sf0.01, first 50 registry keys per round).  This module
folds those files into a per-query "latest driver-green round" map so
tests and COVERAGE.md can distinguish *driver-green (round N)* from
*local-parity only* — the distinction VERDICT r2 asked to make
first-class ("What's missing" #1, "Next round" #6).

A row counts as green only when rows, schema AND value-hash all match
with no error; the r2 ev8/qa5 rows (value-identical but HUGEINT-typed
oracles) correctly do NOT count.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green_rounds(repo_root: str = REPO_ROOT) -> dict[str, int]:
    """query key -> latest round with a fully green driver row."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for key, row in data.items():
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
                and not row.get("err")
            )
            if green:
                out[key] = max(out.get(key, 0), rnd)
    return out


def never_driver_green(all_keys, repo_root: str = REPO_ROOT) -> list[str]:
    """Registry keys with no green driver row in any recorded round —
    the set that needs the extra local sf0.01 parity pass (VERDICT r2
    "Next round" #7)."""
    green = driver_green_rounds(repo_root)
    return sorted(k for k in all_keys if k not in green)
