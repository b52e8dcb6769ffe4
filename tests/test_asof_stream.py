"""Streaming as-of join: cross-batch state carry, and equality with the
batch asof_join on a bounded in-order replay."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators.asof import asof_join
from de_gcp_lakehouse_iceberg_spark.streaming.asof_stream import (
    streaming_asof_join,
)

BASE = dt.datetime(2024, 3, 1)


def _t(minute: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minute)


def _run(spark, left_stream, right_stream, ckpt, name):
    q = (
        streaming_asof_join(
            left_stream,
            right_stream,
            by=["k"],
            left_ts="ts",
            right_ts="qts",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_streaming_asof_cross_batch_state(spark, tmp_path):
    """Right quotes arrive in batch 1; a batch-2 left row (no new right
    rows in its batch) must still match via the carried state."""
    lschema = "k long, ts timestamp, v double"
    rschema = "k long, qts timestamp, quote double"
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    ldir.mkdir(), rdir.mkdir()
    spark.createDataFrame(
        [(1, _t(5), 1.0), (1, _t(12), 2.0)], lschema
    ).coalesce(1).write.parquet(str(ldir / "f1"))
    spark.createDataFrame(
        [(1, _t(30), 3.0), (2, _t(31), 4.0)], lschema
    ).coalesce(1).write.parquet(str(ldir / "f2"))
    spark.createDataFrame(
        [(1, _t(0), 10.0), (1, _t(10), 11.0)], rschema
    ).coalesce(1).write.parquet(str(rdir / "f1"))

    ls = (
        spark.readStream.schema(lschema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(ldir) + "/*")
    )
    rs = spark.readStream.schema(rschema).parquet(str(rdir) + "/*")
    out = {
        (r.k, r.ts, r.asof_quote)
        for r in _run(spark, ls, rs, str(tmp_path / "ck1"), "asof_s1").collect()
    }
    assert out == {
        (1, _t(5), 10.0),   # batch 1: quote@0
        (1, _t(12), 11.0),  # batch 1: quote@10
        (1, _t(30), 11.0),  # batch 2: carried state, no new right rows
        (2, _t(31), None),  # no quote for key 2, ever
    }


def test_streaming_asof_matches_batch_on_replay(spark, tmp_path, sf_dir):
    """Single-batch replay of a real events-derived fixture: the stream
    result must equal operators/asof.py's batch result row-for-row."""
    from de_gcp_lakehouse_iceberg_spark.tables import table

    ev = table(spark, sf_dir, "events")
    left = ev.select(
        F.col("user_id").alias("k"), "ts", F.col("value").alias("v")
    )
    # quotes: a deterministic sparse subset, unique (k, qts)
    right = (
        ev.filter(F.col("event_id") % 7 == 0)
        .groupBy(
            F.col("user_id").alias("k"), F.col("ts").alias("qts")
        )
        .agg(F.max("value").alias("quote"))
    )
    want = sorted(
        (r.k, r.ts, r.v, r.asof_qts, r.asof_quote)
        for r in asof_join(
            left, right, by=["k"], left_ts="ts", right_ts="qts"
        ).collect()
    )

    ldir, rdir = tmp_path / "lsrc", tmp_path / "rsrc"
    left.coalesce(1).write.parquet(str(ldir))
    right.coalesce(1).write.parquet(str(rdir))
    ls = spark.readStream.schema(left.schema).parquet(str(ldir))
    rs = spark.readStream.schema(right.schema).parquet(str(rdir))
    got = sorted(
        (r.k, r.ts, r.v, r.asof_qts, r.asof_quote)
        for r in _run(spark, ls, rs, str(tmp_path / "ck2"), "asof_s2").collect()
    )
    assert got == want and got
