"""Incremental SCD2 change application — apply a CDC batch to an
existing slowly-changing dimension without rebuilding history.

The reference's SCD2 surface is one-shot: silver loads re-derive
end-dates over the whole table each run (reference
tools.load_crm_prd_info_v1.sql:91-96 LEAD end-dating, re-expressed
batch-side by operators/windows.py w2).  At warehouse scale the
change feed is a trickle against a dimension with years of history —
re-deriving every key's versions per batch is the mv_incremental
anti-pattern all over again.  This module applies a batch by touching
ONLY the affected keys:

  1. versionize the batch internally (LEAD end-dating within the
     batch, exactly w2's window),
  2. close each touched key's open version at the key's FIRST new
     change timestamp (half-open [from, to) intervals stay
     contiguous),
  3. append the new versions; untouched rows pass through untouched.

Correctness contract (pytest `tests/test_scd2.py`): for a
timestamp-monotone CDC feed, any batch split applied incrementally is
ROW-IDENTICAL to `full_rebuild` over the concatenated feed — the same
literal-oracle equality mv_incremental pins for aggregate state.

Scale design (100 TB dimension, MB-sized batches):
  * The touched-key set is a broadcast: batch keys are tiny relative
    to the dim, so closing open versions is a map-side join — the dim
    never shuffles.
  * The append is batch-sized.  With the dim bucketed by key
    (plans/bucketing.py layout) both the close and the append stay
    partition-local, and the downstream fact lookup keeps its
    zero-exchange join.
  * Multiple changes for one key inside a batch are handled by the
    in-batch window (per-key rows, bounded by batch size).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

META = ("effective_from", "effective_to", "is_current")


def versionize(
    changes: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """w2's LEAD end-dating over a change feed: each version's
    half-open validity ends where the key's next change begins; the
    last version per key is open (effective_to NULL, is_current)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    return (
        changes.withColumn("effective_from", F.col(ts))
        .withColumn("effective_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
    )


def full_rebuild(
    all_changes: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """The one-shot reference semantics: versionize the entire
    concatenated feed.  The incremental path must equal this."""
    return versionize(all_changes, key, ts, tiebreak)


def apply_changes(
    dim: DataFrame, batch: DataFrame, key: str, ts: str, tiebreak: str
) -> DataFrame:
    """Apply one CDC batch to an SCD2 dimension incrementally.

    Precondition (asserted by the caller's feed contract, tested):
    every change timestamp in `batch` is strictly later than every
    existing version start for that key — the standard monotone CDC
    ordering a log-based source guarantees per key.
    """
    firsts = batch.groupBy(key).agg(
        F.min(F.struct(ts, tiebreak)).getField(ts).alias("_first_new_ts")
    )
    touched = dim.join(F.broadcast(firsts), on=key, how="left")
    closed = (
        touched.withColumn(
            "effective_to",
            F.when(
                F.col("is_current") & F.col("_first_new_ts").isNotNull(),
                F.col("_first_new_ts"),
            ).otherwise(F.col("effective_to")),
        )
        .withColumn(
            "is_current",
            F.col("is_current") & F.col("_first_new_ts").isNull(),
        )
        .drop("_first_new_ts")
    )
    return closed.unionByName(versionize(batch, key, ts, tiebreak))


def apply_feed(
    init: DataFrame,
    batches: Sequence[DataFrame],
    key: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Fold a sequence of CDC batches into the dimension."""
    dim = versionize(init, key, ts, tiebreak)
    for b in batches:
        dim = apply_changes(dim, b, key, ts, tiebreak)
    return dim
