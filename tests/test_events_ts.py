"""Regression guard for the events `ts` dtype drift (round-2 verdict).

The driver's testdata has shipped events.parquet with `ts` as both
TIMESTAMP(NANOS) (Spark: long under nanosAsLong) and timestamp[us]
(Spark: TIMESTAMP_NTZ). Round 2 shipped a regression where the streaming
reader force-read the micros as raw longs and divided by 1000, landing
every event in January 1970. These tests pin the contract: whatever
vintage is on disk, the batch reader and the streaming reader produce
the exact same TIMESTAMP instants.
"""

from __future__ import annotations

import glob
import uuid

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.streaming.pipeline import read_events_stream
from de_gcp_lakehouse_iceberg_spark.tables import normalize_events_ts, table

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_batch_reader_yields_timestamp(spark, sf_dir):
    df = table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # Sanity on the instant itself: the generator's event times are in a
    # plausible recent-years range, not 1970 (the round-2 failure mode
    # compressed the timeline 1000x into January 1970).
    row = df.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    assert row["lo"].year >= 2000, f"ts collapsed to {row['lo']} — unit bug"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_stream_reader_matches_batch_instants(spark, sf_dir):
    """Batch and streaming readers must agree on every (event_id, ts)
    pair — this is the invariant whose violation broke q25/q29 in r2."""
    batch = table(spark, sf_dir, "events").select("event_id", "ts")
    sink = f"ts_parity_{uuid.uuid4().hex[:8]}"
    q = (
        read_events_stream(spark, sf_dir)
        .select("event_id", "ts")
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(sink)
    assert dict(streamed.dtypes)["ts"] == "timestamp"
    # anti-join both ways: zero rows differ
    assert batch.exceptAll(streamed).count() == 0
    assert streamed.exceptAll(batch).count() == 0


def test_normalize_dispatches_all_vintages(spark):
    """The helper must map every historical physical type of `ts` to the
    same instants: long nanos, TIMESTAMP_NTZ micros, and plain timestamp."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    micros = 1_700_000_000_123_456  # 2023-11-14T22:13:20.123456Z
    as_nanos = spark.createDataFrame(
        [(1, micros * 1000)], "event_id bigint, ts bigint"
    )
    as_ntz = spark.createDataFrame(
        [(1, micros)], "event_id bigint, ts_us long"
    ).select(
        "event_id", F.timestamp_micros("ts_us").cast("timestamp_ntz").alias("ts")
    )
    as_ts = spark.createDataFrame(
        [(1, micros)], "event_id bigint, ts_us long"
    ).select("event_id", F.timestamp_micros("ts_us").alias("ts"))

    outs = [normalize_events_ts(df) for df in (as_nanos, as_ntz, as_ts)]
    vals = set()
    for out in outs:
        assert dict(out.dtypes)["ts"] == "timestamp"
        vals.add(out.select(F.unix_micros("ts")).collect()[0][0])
    assert vals == {micros}
