"""Sessionization: batch window-function form vs hand-computed
sessions, and the applyInPandasWithState streaming form carrying open
sessions across micro-batches (closed sessions must match batch)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.streaming.sessions import (
    batch_sessions,
    streaming_sessions,
)

BASE = dt.datetime(2025, 5, 1, 10, 0, 0)


def _ev(user, minute, value=1.0):
    return (user, BASE + dt.timedelta(minutes=minute), value)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def test_batch_sessions_gap_split(spark):
    rows = [
        _ev(1, 0), _ev(1, 10), _ev(1, 20),   # session A: 0-20
        _ev(1, 60), _ev(1, 65),              # session B: 60-65 (40min gap)
        _ev(2, 5),                           # single-event session
    ]
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in batch_sessions(_events(spark, rows), gap_seconds=1800).collect()
    )
    assert got == [
        (1, BASE, BASE + dt.timedelta(minutes=20), 3, 3.0),
        (1, BASE + dt.timedelta(minutes=60), BASE + dt.timedelta(minutes=65), 2, 2.0),
        (2, BASE + dt.timedelta(minutes=5), BASE + dt.timedelta(minutes=5), 1, 1.0),
    ]


def test_streaming_sessions_cross_batch_state(spark, tmp_path):
    """Session A's events arrive across TWO micro-batches; state must
    stitch them into one session, closed by a later-gap event."""
    d = tmp_path / "src"
    d.mkdir()
    schema = "user_id long, ts timestamp, value double"
    # batch 1: first half of session A
    spark.createDataFrame(
        [_ev(1, 0), _ev(1, 10)], schema
    ).coalesce(1).write.mode("append").parquet(str(d / "f1"))
    # batch 2: rest of A (+20), then a gap, then session B opener (+90)
    spark.createDataFrame(
        [_ev(1, 20), _ev(1, 90), _ev(2, 0)], schema
    ).coalesce(1).write.mode("append").parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_sessions(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    closed = [
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.table("sessions_out").collect()
    ]
    # only session A closed (B and user-2's are still open in state)
    assert closed == [(1, BASE, BASE + dt.timedelta(minutes=20), 3, 3.0)]


def test_streaming_closed_sessions_match_batch(spark, tmp_path, sf_dir):
    """Bounded replay over real events: every session the stream closes
    must appear identically in the batch computation."""
    from de_gcp_lakehouse_iceberg_spark.tables import table

    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch_sessions(ev, gap_seconds=300).collect()
    }
    # replay the same rows through the stateful stream (single batch —
    # arrival order within the batch is handled by the sort in-state)
    src_dir = tmp_path / "events_src"
    ev.coalesce(1).write.parquet(str(src_dir))
    stream = spark.readStream.schema(ev.schema).parquet(str(src_dir))
    q = (
        streaming_sessions(stream, gap_seconds=300)
        .writeStream.format("memory")
        .queryName("sessions_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sessions_replay").collect()
    }
    assert streamed, "no sessions closed in replay"
    assert streamed <= batch  # closed sessions agree; open ones pending


def test_streaming_sessions_idle_timeout_flush(spark, tmp_path):
    """With idle_timeout_seconds, a user who stops emitting gets their
    OPEN session flushed by the processing-time timeout — no follow-up
    event needed (and state is removed, so nothing re-emits)."""
    import time

    d = tmp_path / "src"
    d.mkdir()
    schema = "user_id long, ts timestamp, value double"
    spark.createDataFrame(
        [_ev(1, 0), _ev(1, 10)], schema
    ).coalesce(1).write.mode("append").parquet(str(d / "f1"))

    stream = spark.readStream.schema(schema).parquet(str(d) + "/*")
    q = (
        streaming_sessions(stream, gap_seconds=1800, idle_timeout_seconds=2)
        .writeStream.format("memory")
        .queryName("sessions_timeout")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_t"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.table("sessions_timeout").collect()
            if rows:
                break
            time.sleep(0.5)
        assert rows, "idle session never flushed by timeout"
        (r,) = rows
        assert (r.user_id, r.n_events) == (1, 2)
        assert r.session_start == BASE
        assert r.session_end == BASE + dt.timedelta(minutes=10)
        # flushed once: give it a little longer and confirm no re-emit
        time.sleep(3)
        assert len(spark.table("sessions_timeout").collect()) == 1
    finally:
        q.stop()
