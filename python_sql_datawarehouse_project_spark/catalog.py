"""Table registry over the parquet test tables.

The reference resolves tables through config tables in a `tools`
schema (reference sql/tools/ddl_tools.sql:4-233); here the registry is
a plain name->path mapping over a scale-factor directory, loaded
lazily so Catalyst sees a parquet scan it can push filters into.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def events_ts_is_nanos(path: str) -> bool:
    """True when `events.ts` is stored as parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects without the
    legacy.parquet.nanosAsLong conf.  Footer-only sniff (no data IO)
    so the reader adapts to whichever unit the data generator used —
    the driver has shipped both nanos and micros over time.
    """
    import pyarrow.parquet as pq

    return str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one registry table.

    `events.ts` stored as TIMESTAMP(NANOS) is read as raw nanos
    (legacy.parquet.nanosAsLong runtime conf) and truncated to
    microseconds — exactly what DuckDB's us-resolution TIMESTAMP does,
    so oracle comparisons agree to the microsecond.  Micros-unit data
    needs no workaround and reads natively.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registry has {TABLES}")
    path = table_path(sf_dir, name)
    if name == "events" and events_ts_is_nanos(path):
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # integer `div`, NOT `/`: float division of epoch-nanos loses
        # sub-microsecond precision (1.7e18 needs 61 bits > double's 53)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register every registry table as a temp view for spark.sql use."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
