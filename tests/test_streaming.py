"""Streaming twins must reproduce their batch counterparts exactly on
bounded input — the batch queries are themselves oracle-checked
against DuckDB, so equality here transitively certifies the streaming
path (SURVEY.md §2.9 extension)."""

from __future__ import annotations

from python_sql_datawarehouse_project_spark.operators import events as batch_events
from python_sql_datawarehouse_project_spark.streaming import windows as sw


def _rows(df):
    return sorted(map(str, df.collect()))


def test_stream_tumbling_equals_batch(spark, sf_dir):
    got = sw.stream_tumbling_hourly(spark, sf_dir)
    want = batch_events.ev1_tumbling_hourly(spark, sf_dir)
    assert _rows(got) == _rows(want)


def test_stream_sessions_equal_batch(spark, sf_dir):
    got = sw.stream_session_windows(spark, sf_dir)
    want = batch_events.ev3_session_windows(spark, sf_dir)
    assert _rows(got) == _rows(want)


def test_stream_is_incremental(spark, sf_dir):
    # the source really is a stream (not a disguised batch read)
    from python_sql_datawarehouse_project_spark.catalog import table_path

    src = table_path(sf_dir, "events")
    with sw._scoped_nanos_conf(spark), sw._staged_source_dir(src) as stage:
        st = sw.events_stream(spark, sf_dir, stage)
        assert st.isStreaming


def test_stream_scopes_session_conf(spark, sf_dir):
    # a drained stream query must not leave the nanos reader conf set
    spark.conf.unset(sw._NANOS_CONF)
    before = spark.conf.get(sw._NANOS_CONF)  # engine default
    assert before == "false"
    sw.stream_tumbling_hourly(spark, sf_dir)
    assert spark.conf.get(sw._NANOS_CONF) == before
