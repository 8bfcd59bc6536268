"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning (BASELINE.json extension; the reference's analogue
is its Postgres btree indexes, SURVEY.md §2.1 disposition — a
single-dimension structure Spark replaces with SORT/CLUSTER BY
layout + parquet min-max skipping).

  zo1_zorder_code   the Morton code + bucket assignment every row
                    would receive under the layout (the oracled,
                    engine-portable part)
  zorder_write      the write-side layout step: repartitionByRange +
                    sortWithinPartitions on the Morton code, so each
                    parquet file covers a small hyper-rectangle of
                    (customer, order-date) space

Why it matters at 100 TB: a date-sorted fact prunes date predicates
but touches EVERY file for a customer predicate; a Z-ordered layout
interleaves the bits of both dimensions, so a 2-D box predicate
(customer range x date range) touches only the files whose Morton
range intersects the box — parquet footer min/max statistics do the
skipping with no index structure at all.  tests/test_plans.py
measures the effect directly: the same box query touches ~an order of
magnitude fewer files on the Z-ordered layout than on a date-sorted
one.

Engine portability: the Morton code is pure int64 arithmetic —
min/max normalization to 16 bits per dimension (integer DIV — no
floats), then a 32-term shift/mask bit interleave.  Both engines
evaluate the identical expression; the normalization bounds come from
a 1-row min/max aggregate (broadcast on the Spark side, CROSS JOIN of
a 1-row subquery on the DuckDB side), NOT from literals, so the
layout adapts to the data without a config contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

ZBITS = 16  # bits per dimension -> 32-bit Morton code
ZBUCKET_BITS = 6  # top bits of the code -> 64 range buckets
_EPOCH = "1970-01-01"


def _scale16(x: Column, lo: Column, hi: Column) -> Column:
    """Normalize integer x in [lo, hi] onto [0, 2^ZBITS - 1] with
    pure integer arithmetic (identical DIV semantics both engines —
    no float rounding in the layout contract)."""
    span = F.greatest(hi - lo, F.lit(1))
    scaled = (x - lo) * F.lit((1 << ZBITS) - 1)
    # (scaled - mod) is an exact multiple of span and far below 2^53,
    # so the double division is exact and the cast is lossless — same
    # quotient DuckDB's integer // computes.
    return ((scaled - F.pmod(scaled, span)) / span).cast("long")


def _interleave(b1: Column, b2: Column) -> Column:
    """32-bit Morton interleave: bit i of b1 -> bit 2i, bit i of b2
    -> bit 2i+1.  A flat 32-term integer expression — whole-stage
    codegen compiles it to straight-line long math."""
    out = F.lit(0).cast("long")
    for i in range(ZBITS):
        out = (
            out
            + F.shiftleft(F.shiftright(b1.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(b2.cast("long"), i) % 2, 2 * i + 1)
        )
    return out


def _with_morton(orders: DataFrame) -> DataFrame:
    """orders + (morton, zbucket) columns; bounds via broadcast 1-row
    min/max aggregate."""
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit(_EPOCH))
    ).cast("long")
    keyed = orders.withColumn("_days", days)
    bounds = keyed.agg(
        F.min("o_custkey").alias("ck_lo"),
        F.max("o_custkey").alias("ck_hi"),
        F.min("_days").alias("d_lo"),
        F.max("_days").alias("d_hi"),
    )
    j = keyed.crossJoin(F.broadcast(bounds))
    morton = _interleave(
        _scale16(F.col("o_custkey"), F.col("ck_lo"), F.col("ck_hi")),
        _scale16(F.col("_days"), F.col("d_lo"), F.col("d_hi")),
    )
    return j.withColumn("morton", morton).withColumn(
        "zbucket", F.shiftright(F.col("morton"), 2 * ZBITS - ZBUCKET_BITS)
    )


def zo1_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout assignment itself, as an oracled gate: every
    order's Morton code and range bucket.  What the oracle proves is
    exactly what the write path sorts by — so a green row here means
    the cross-engine layout contract (not just some hash) is stable."""
    orders = load_table(spark, sf_dir, "orders")
    return _with_morton(orders).select("o_orderkey", "morton", "zbucket")


def _sql_scale16(x: str, lo: str, hi: str) -> str:
    span = f"greatest({hi} - {lo}, 1)"
    scaled = f"(({x} - {lo}) * {(1 << ZBITS) - 1})"
    return f"(({scaled} - mod({scaled}, {span})) // {span})"


def _sql_interleave(b1: str, b2: str) -> str:
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({b1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b2} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


ZO1_ORACLE = f"""
WITH keyed AS (
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_orderdate AS DATE) - DATE '{_EPOCH}' AS BIGINT)
               AS d
    FROM orders
),
bounds AS (
    SELECT MIN(o_custkey) AS ck_lo, MAX(o_custkey) AS ck_hi,
           MIN(d) AS d_lo, MAX(d) AS d_hi
    FROM keyed
),
coded AS (
    SELECT o_orderkey,
           {_sql_interleave(
               _sql_scale16("o_custkey", "ck_lo", "ck_hi"),
               _sql_scale16("d", "d_lo", "d_hi"),
           )} AS morton
    FROM keyed CROSS JOIN bounds
)
SELECT o_orderkey, CAST(morton AS BIGINT) AS morton,
       CAST(morton >> {2 * ZBITS - ZBUCKET_BITS} AS BIGINT) AS zbucket
FROM coded
"""


def zorder_write(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 64
) -> None:
    """Write orders Z-ordered: range-partition on the Morton code
    (so each output file owns a contiguous Morton range = a small
    hyper-rectangle of key space) and sort within partitions (so
    parquet row-group min/max stats are tight).  At warehouse scale
    this is the periodic compaction/OPTIMIZE step; n_files sizes
    files at ~total/n_files."""
    df = _with_morton(load_table(spark, sf_dir, "orders")).drop(
        "_days", "ck_lo", "ck_hi", "d_lo", "d_hi"
    )
    (
        df.repartitionByRange(n_files, "morton")
        .sortWithinPartitions("morton")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


QUERIES = {"zo1_zorder_code": zo1_zorder_code}
ORACLES = {"zo1_zorder_code": ZO1_ORACLE}
