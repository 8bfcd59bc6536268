"""Replicates the driver's DuckDB-oracle gate locally at sf0.001:
every registry query with an oracle must match on row count, columns
and order-insensitive canonicalized values."""

from __future__ import annotations

import os

import pytest

from python_sql_datawarehouse_project_spark import provenance, registry
from python_sql_datawarehouse_project_spark.testing import compare

_QUERIES = registry.queries()
_ORACLES = registry.oracles()

# Queries with no green driver correctness row in any recorded round
# get a second parity pass at sf0.01: sf0.001 is small enough that
# boundary conditions (empty partitions, single-band buckets) can pass
# trivially (VERDICT r2 #7).  The set shrinks automatically as rounds
# record green rows.
_NEVER_DRIVER_GREEN = provenance.never_driver_green(_ORACLES)
_SF01_DIR = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.01")


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, sf_dir):
    res = compare(name, _QUERIES[name], _ORACLES[name], spark, sf_dir)
    assert res.ok, (
        f"{name}: rows spark={res.spark_rows} oracle={res.oracle_rows}, "
        f"columns_match={res.columns_match}, values_match={res.values_match}; "
        + "; ".join(res.mismatches)
    )


@pytest.mark.parametrize("name", _NEVER_DRIVER_GREEN)
def test_never_driver_green_also_match_at_sf01(name, spark):
    if not os.path.isdir(_SF01_DIR):
        pytest.skip(f"no sf0.01 testdata at {_SF01_DIR}")
    res = compare(name, _QUERIES[name], _ORACLES[name], spark, _SF01_DIR)
    assert res.ok, (
        f"{name}@sf0.01: rows spark={res.spark_rows} oracle={res.oracle_rows}, "
        f"columns_match={res.columns_match}, types_match={res.types_match}, "
        f"values_match={res.values_match}; " + "; ".join(res.mismatches)
    )


def test_every_query_has_entry_or_documented_gap():
    missing = set(_QUERIES) - set(_ORACLES)
    # Only non-SQL-expressible operators may omit an oracle:
    # streaming (stateful) and multimodal UDF stages (python decode).
    allowed_gaps = {n for n in missing if n.startswith(("stream_", "mm2", "mm3"))}
    assert missing == allowed_gaps, f"queries without oracle: {missing - allowed_gaps}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_harness_flags_hugeint_oracle(spark, sf_dir):
    # The bug class that shipped in r1 (ev4/mm1) and r2 (ev8/qa5): a
    # DuckDB oracle carrying SUM(integer) as HUGEINT hash-fails at the
    # driver even when all values are identical.  The harness must flag
    # it locally as a TYPE mismatch (VERDICT r2 #3) — reverting any of
    # the CAST(... AS BIGINT) oracle fixes now fails pytest here and in
    # the per-query parity tests above.
    from pyspark.sql import functions as F

    from python_sql_datawarehouse_project_spark.catalog import load_table

    def q(spark, sf_dir):
        return (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    hugeint = "SELECT o_orderpriority, SUM(1) AS n FROM orders GROUP BY 1"
    res = compare("hugeint_probe", q, hugeint, spark, sf_dir)
    assert not res.types_match and not res.ok
    assert any("decimal128(38, 0)" in m for m in res.mismatches), res.mismatches

    fixed = (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders GROUP BY 1"
    )
    assert compare("hugeint_probe_fixed", q, fixed, spark, sf_dir).ok
