"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names and
(order-insensitively) canonicalized values.  Used by the pytest suite
at sf0.001 so oracle drift is caught before the driver's sf0.01 run.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, table_path


def _canon_value(v):
    """Normalize a cell to a hashable, engine-independent value."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _decimal.Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        if v.time() == _dt.time(0, 0) and v.tzinfo is None:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bool):
        return bool(v)
    return v


def _type_category(t) -> str:
    """Coarse cross-engine type category for the strict type check.

    The driver's value hash distinguishes int from Decimal, so a
    DuckDB oracle that carries SUM(BIGINT) as HUGEINT (arrow
    decimal128(38,0)) hash-fails at the driver even when every value
    is identical — the bug class that shipped in rounds 1 (ev4/mm1)
    and 2 (ev8/qa5) because fetchall() converts HUGEINT to Python int
    and the old canonicalizer coerced Decimal to float.  Comparing
    categories (integral / floating / decimal) per column catches it
    locally before the driver does.
    """
    import pyarrow as pa

    if isinstance(t, str):  # Spark simpleString
        if t in ("tinyint", "smallint", "int", "bigint"):
            return "integral"
        if t in ("float", "double"):
            return "floating"
        if t.startswith("decimal"):
            return "decimal"
        return "other"
    if pa.types.is_integer(t):
        return "integral"
    if pa.types.is_floating(t):
        return "floating"
    if pa.types.is_decimal(t):
        return "decimal"
    return "other"


def _canon_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    canon.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return canon


@dataclass
class ParityResult:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    values_match: bool
    types_match: bool = True
    mismatches: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.types_match
            and self.values_match
        )


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL in DuckDB with the driver's view setup."""
    import duckdb

    con = duckdb.connect()
    try:
        for t in TABLES:
            p = table_path(sf_dir, t)
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        # Arrow fetch (not fetchall) so the oracle's carried types are
        # visible: DuckDB's relational fetchall() narrows HUGEINT to a
        # Python int, which is exactly what made the old harness blind
        # to the HUGEINT-vs-BIGINT driver hash failures.
        tbl = con.execute(sql).fetch_arrow_table()
        cols = list(tbl.schema.names)
        types = [tbl.schema.field(i).type for i in range(tbl.num_columns)]
        pycols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        rows = list(zip(*pycols)) if tbl.num_columns else []
        return cols, rows, types
    finally:
        con.close()


def compare(
    name: str,
    query_fn,
    oracle: str,
    spark: SparkSession,
    sf_dir: str,
    max_report: int = 5,
) -> ParityResult:
    sdf: DataFrame = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows, o_types = run_oracle(oracle, sf_dir)

    res = ParityResult(
        name=name,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        columns_match=sorted(s_cols) == sorted(o_cols),
        values_match=False,
    )
    if not res.columns_match:
        res.mismatches.append(f"columns: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return res

    s_types = dict(sdf.dtypes)
    for c, ot in zip(o_cols, o_types):
        s_cat, o_cat = _type_category(s_types[c]), _type_category(ot)
        if s_cat != o_cat:
            res.types_match = False
            res.mismatches.append(
                f"type: {c} spark={s_types[c]}({s_cat}) oracle={ot}({o_cat})"
            )
    if not res.types_match:
        return res

    sc = _canon_rows(s_cols, s_rows)
    oc = _canon_rows(o_cols, o_rows)
    res.values_match = sc == oc
    if not res.values_match:
        from collections import Counter

        s_only = Counter(sc) - Counter(oc)
        o_only = Counter(oc) - Counter(sc)
        for r, _ in list(s_only.items())[:max_report]:
            res.mismatches.append(f"spark-only: {r}")
        for r, _ in list(o_only.items())[:max_report]:
            res.mismatches.append(f"oracle-only: {r}")
    return res
