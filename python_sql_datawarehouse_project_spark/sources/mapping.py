"""Mapping-driven projection P1-P3 (SURVEY.md §2.2) — the config
layer that renames raw source columns to bronze target columns.

  P1: rename/projection from a column mapping
      [reference scripts/load_to_bronze.py:527-560]
  P2: heuristic id re-cast — if the TARGET name is id-like and the
      target type is integral, CAST(ROUND(CAST(x AS DOUBLE)) AS
      BIGINT) (pandas inference turns int ids with NaNs into
      doubles); numeric targets get a plain numeric cast
      [load_to_bronze.py:246-262,527-553]
  P3: dwh_batch_id literal injection [load_to_bronze.py:559]

Name normalization (case/space-insensitive matching) mirrors the
reference's normalize_name [batch_processing.py:59-79].

All of it is a single .select() of column expressions — zero shuffle,
fully pushed into the scan at any scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# id-like target names: "id", "*_id", "id_*", or trailing "id"
# (reference load_to_bronze.py:246-262's regex heuristic).
_ID_RE = re.compile(r"(^id$)|(_id$)|(^id_)|(id$)", re.IGNORECASE)

_INT_TYPES = {"int", "integer", "bigint", "long", "smallint", "tinyint"}
_NUM_TYPES = {"double", "float", "decimal", "numeric", "real"}


def normalize_name(name: str) -> str:
    """Case/whitespace-insensitive identifier normalization."""
    return re.sub(r"\s+", "_", name.strip().lower())


@dataclass(frozen=True)
class ColumnMapping:
    """One source->target column rename with the target's declared type
    (the reference's tools.column_mapping row + information_schema
    type lookup)."""

    source: str
    target: str
    target_type: str = "string"


def _cast_for_target(col: Column, m: ColumnMapping) -> Column:
    base = m.target_type.lower().split("(")[0]
    if _ID_RE.search(m.target) and base in _INT_TYPES:
        # P2: round through double first — id columns arrive as
        # inference-mangled doubles ("1.0") from NaN-bearing sources
        return F.round(col.cast("double")).cast("long")
    if base in _NUM_TYPES or base in _INT_TYPES:
        return col.cast(m.target_type if "(" in m.target_type else base)
    return col


def apply_mapping(
    df: DataFrame,
    mappings: list[ColumnMapping],
    batch_id: str | None = None,
) -> DataFrame:
    """P1 projection/rename + P2 casts + P3 batch stamp.

    Source columns are matched by normalized name, so a CSV header
    ' Cst Gendr ' maps onto source 'cst_gendr' (the reference's real
    data depends on this: header cst_gendr -> bronze cst_gndr)."""
    by_norm = {normalize_name(c): c for c in df.columns}
    cols = []
    for m in mappings:
        src = by_norm.get(normalize_name(m.source))
        if src is None:
            raise KeyError(
                f"mapping source column {m.source!r} not in {df.columns}"
            )
        cols.append(_cast_for_target(F.col(src), m).alias(m.target))
    out = df.select(*cols)
    if batch_id is not None:
        out = out.withColumn("dwh_batch_id", F.lit(batch_id))
    return out
