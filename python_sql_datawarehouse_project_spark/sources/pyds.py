"""Custom Spark data source via the Python Data Source API
(pyspark.sql.datasource, Spark 4) — the extension seam for sources
Spark has no built-in reader for.

`SyntheticDocsDataSource` is the shipped instance: a deterministic,
partitioned document generator (`spark.read.format("synthetic_docs")`)
producing the same schema as the `documents` table.  Its role is
load/soak testing the text/dedup operator families at ARBITRARY scale
with zero storage: the generator is seeded and row-addressed, so any
(seed, n_rows) pair yields bitwise-identical corpora on every run,
every partitioning, every cluster size.

Why this shape: the reference ingests landed files only; a
100 TB-class engine also needs a way to drive its operators harder
than any fixture on disk.  A row-addressed generator scales the input
without scaling storage, and the Python Data Source API is the
idiomatic Spark-4 seam for it (executors run `read(partition)` in
parallel — the driver never materializes a row).

Determinism contract: row content is a pure function of (seed,
row_id) via splitmix64 — no RNG state shared across rows, so
partition boundaries cannot change content (pinned in
tests/test_ingestion.py).

Scale notes: partitions() returns `n_parts` equal row ranges; each
executor generates its range lazily (tuples yielded one at a time
into Arrow batches).  Generation is O(rows/partition) with zero
shuffle, zero disk — scan-equivalent parallelism.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "the a data table row column key value query join scan filter sort "
    "merge agg window stream batch spark line part order customer group "
    "small big fast slow hash dup"
).split()

_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """The splitmix64 mixing function — the standard seed expander
    (public domain constant set); pure int math, stable everywhere."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


_LANGS = ("en", "es", "de", "fr", "zh")


def doc_row(seed: int, row_id: int) -> tuple:
    """The (doc_id, text, lang, source, n_chars) tuple for one row —
    a pure function, exported so tests can assert the executor-side
    generator against a driver-side recomputation."""
    h = _splitmix64((seed << 32) ^ row_id)
    n_words = 20 + (h & 63)
    words = []
    w = h
    for _ in range(n_words):
        w = _splitmix64(w)
        words.append(_WORDS[w % len(_WORDS)])
    text = " ".join(words)
    return (
        row_id,
        text,
        _LANGS[(h >> 8) % len(_LANGS)],
        f"src{(h >> 16) % 20}",
        len(text),
    )


class _Range(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed, self.start, self.end = seed, start, end


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = max(1, int(options.get("n_parts", 8)))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _Range(self.seed, lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Range):
        for rid in range(partition.start, partition.end):
            yield doc_row(partition.seed, rid)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint"
        )

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotent registration: after this,
    spark.read.format("synthetic_docs") resolves in this session."""
    spark.dataSource.register(SyntheticDocsDataSource)
