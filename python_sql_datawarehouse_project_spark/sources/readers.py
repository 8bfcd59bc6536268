"""File readers S1-S6 (SURVEY.md §2.1).

The reference normalizes every landed file to snappy parquet via
pandas (reference handlers/convert_to_parquet.py:181-208); here each
format is a native Spark reader returning a lazy DataFrame — there is
no separate "convert" step because every downstream operator consumes
the DataFrame directly, and the bronze write (Warehouse.write_batch)
lands snappy parquet anyway.

  read_csv      S1: header + schema inference (or explicit schema)
                [convert_to_parquet.py:184]
  read_excel    S2: no core Spark reader; driver-side pandas bridge
                when an engine is available, else the stdlib ZIP+XML
                xlsx parser (sources/xlsx.py); legacy .xls gets a
                typed UnsupportedSourceError [convert_to_parquet.py:186]
  read_json     S3: JSONL first, whole-document fallback
                [convert_to_parquet.py:188-191]
  read_parquet  S4: native [convert_to_parquet.py:193]
  read_schema   S5: metadata-only column listing
                [validate_mapping.py:365-366]
  read_orc      interchange format beyond the reference surface
  read_text     raw line-corpus ingestion (one row per line)
  read_binary   whole-file binary ingestion (the multimodal
                payload path for operators/multimodal.py)

Scale: csv/json/parquet readers are distributed scans with pushdown;
Excel is driver-side by design — in the reference's contract xlsx
files are small pre-ingest landing files, never warehouse-scale data
(the same assumption the reference's pandas conversion makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class UnsupportedSourceError(RuntimeError):
    """Raised when a source format has no available reader engine."""


def read_csv(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    r = spark.read.option("header", True)
    if schema is not None:
        return r.schema(schema).csv(path)
    return r.option("inferSchema", True).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """JSONL natively; whole-document arrays via multiLine fallback
    (the reference tries lines=True then falls back the same way)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    df = r.json(path)
    if "_corrupt_record" in df.columns and len(df.columns) == 1:
        df = spark.read.option("multiLine", True).json(path)
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """First-sheet Excel read (reference convert_to_parquet.py:186,
    pd.read_excel(src, sheet_name=0)).

    Engine order: pandas with an installed Excel engine when
    available (full style/date fidelity), else the stdlib parsers —
    sources/xlsx.py (ZIP+XML) for .xlsx, sources/xls.py (CFB+BIFF8)
    for legacy binary .xls — so every Excel landing file the
    reference ingests through pd.read_excel reads here with no
    third-party engine at all."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=0)
        return spark.createDataFrame(pdf)
    except (ImportError, ValueError) as e:
        # ImportError: engine package missing; ValueError("... specify
        # an engine manually"): pandas can't even sniff the format
        # with zero engines installed.  Same capability gap.
        if isinstance(e, ValueError) and "engine" not in str(e):
            raise
    from .xls import read_first_sheet_xls
    from .xlsx import read_first_sheet

    try:
        with open(path, "rb") as f:
            magic = f.read(8)
        if magic.startswith(b"\xd0\xcf\x11\xe0"):  # OLE2: legacy .xls
            header, rows = read_first_sheet_xls(path)
        else:
            header, rows = read_first_sheet(path)
    except Exception as e:  # neither a zip xlsx nor a CFB xls
        raise UnsupportedSourceError(
            f"no Excel engine available to read {path!r} and the "
            f"stdlib xlsx/xls fallbacks could not parse it: {e}"
        ) from e
    pdf = pd.DataFrame(rows, columns=header)
    return spark.createDataFrame(pdf)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — native columnar reader with the same pushdown/prune
    behavior as parquet (vectorized, predicate pushdown, column
    pruning).  The reference's single landing format is parquet; ORC
    rounds out the warehouse-interchange formats Spark ships built-in."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text scan: one `value` string column per line —
    the raw-corpus ingestion path (a documents table before parsing).
    Distributed: files split by line ranges like any other scan."""
    return spark.read.text(path)


def read_binary(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file binary scan (`binaryFile`): path, modificationTime,
    length, content columns — the ingestion path for the multimodal
    payloads of operators/multimodal.py (image/audio blobs land as
    files; this turns a directory of them into the binary-column table
    mm1-mm5 consume).  Each file is one row; parallelism comes from
    many files, and `pathGlobFilter` scopes the listing."""
    return spark.read.format("binaryFile").load(path)


READERS = {
    "csv": read_csv,
    "json": read_json,
    "parquet": read_parquet,
    "xlsx": read_excel,
    "xls": read_excel,
    "excel": read_excel,
    "orc": read_orc,
    "text": read_text,
    "txt": read_text,
    "binary": read_binary,
    "bin": read_binary,
}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
) -> DataFrame:
    fmt = fmt.lower().lstrip(".")
    if fmt not in READERS:
        raise UnsupportedSourceError(
            f"unsupported source format {fmt!r}; supported: {sorted(READERS)}"
        )
    reader = READERS[fmt]
    if fmt in ("csv", "json"):
        return reader(spark, path, schema)
    return reader(spark, path)


def read_schema(spark: SparkSession, path: str, fmt: str = "parquet") -> list[str]:
    """S5: metadata-only column listing (no data scan for parquet)."""
    return read_source(spark, path, fmt).columns
