"""Stream-static enrichment join: the streaming twin of the
warehouse's dimension-enrichment pattern (plans/gold.py J1/J4 —
reference scripts/gold_layer.sql joins CRM facts to dims).

`stream_enrich_segments` joins the live events stream against the
STATIC customer and nation dimensions (a stateless stream-static
equi-join — no watermark or state needed on the dimension side; every
micro-batch probes the current dim snapshot), then keeps a running
per-(market-segment, event-type) count + value total.

Scale notes (100 TB): the stream side never shuffles for the join —
the dims broadcast to every task, exactly like the batch star join;
this is THE pattern for real-time fact enrichment (clickstream x user
profile).  The aggregation state is bounded by |segments| x |types|
(tens of rows), not by throughput.  On a real cluster the same code
runs unbounded with a processing-time trigger and the dim snapshot
refreshes per micro-batch read, giving type-1-dim semantics.

Determinism: the value total routes through VALUE_DEC (exact decimal
addition, order-independent) so the drained stream hash-matches the
batch SQL oracle regardless of micro-batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.events import VALUE_DEC
from .windows import events_stream, run_available_now, stream_run_scope


def enrich_segments(stream: DataFrame, cust: DataFrame) -> DataFrame:
    """Running (segment, event_type) totals over the dim-enriched
    stream.  Left join: an event with no matching customer keeps a
    NULL segment bucket instead of disappearing (audit property —
    silent inner-join loss is the classic enrichment bug)."""
    joined = stream.join(
        F.broadcast(cust), stream["user_id"] == cust["c_custkey"], "left"
    )
    return (
        joined.groupBy(
            F.col("c_mktsegment").alias("segment"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_dec").cast("double").alias("total_value"),
        )
    )


def stream_enrich_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table_path

    src = table_path(sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    with stream_run_scope(spark, src) as stage:
        return run_available_now(
            spark,
            enrich_segments(events_stream(spark, sf_dir, stage), cust),
            output_mode="complete",
        )


ENRICH_ORACLE = f"""
SELECT c_mktsegment AS segment, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {VALUE_DEC})) AS DOUBLE) AS total_value
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""

QUERIES = {"stream_enrich_segments": stream_enrich_segments}
ORACLES = {"stream_enrich_segments": ENRICH_ORACLE}
