"""Interval join: batch semantics and the stream-stream form (real
Spark stream-stream inner join with watermarks on both sides) replaying
to the same pairs as batch."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.streaming.interval_join import interval_join
from de_gcp_lakehouse_iceberg_spark.streaming.pipeline import read_events_stream
from de_gcp_lakehouse_iceberg_spark.tables import table


def _purchases(df):
    return df.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )


def _clicks(df):
    return df.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )


def test_interval_join_bounds_inclusive(spark):
    import datetime as dt

    base = dt.datetime(2025, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 10, base)], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, 20, base),                                   # gap 0: in
            (1, 21, base - dt.timedelta(seconds=60)),        # gap 60: in
            (1, 22, base - dt.timedelta(seconds=61)),        # gap 61: out
            (1, 23, base + dt.timedelta(seconds=1)),         # future: out
            (2, 24, base),                                   # other user
        ],
        "user_id long, c_id long, c_ts timestamp",
    )
    got = {
        r.c_id
        for r in interval_join(
            left, right, ["user_id"], "ts", "c_ts", lower_seconds=60
        ).collect()
    }
    assert got == {20, 21}


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    events = table(spark, sf_dir, "events")
    batch_pairs = {
        (r.event_id, r.c_id)
        for r in interval_join(
            _purchases(events),
            _clicks(events),
            ["user_id"],
            "ts",
            "c_ts",
            lower_seconds=1800,
        ).collect()
    }
    assert batch_pairs  # corpus must actually produce attribution pairs

    stream = read_events_stream(spark, sf_dir)
    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        interval_join(
            _purchases(stream),
            _clicks(stream),
            ["user_id"],
            "ts",
            "c_ts",
            lower_seconds=1800,
            watermark="1 hour",
        )
        .select("event_id", "c_id")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.event_id, r.c_id) for r in spark.table(sink).collect()
    }
    assert streamed == batch_pairs
