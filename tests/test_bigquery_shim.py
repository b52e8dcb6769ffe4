"""BigQuery-dialect shim semantics (SURVEY.md §2.8): argument-order
parity for TIMESTAMP_DIFF, canonical timestamp round-trip, geohash
against published test vectors."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.functions import bigquery_shim as bq


def test_timestamp_diff_arg_order(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2025, 1, 1, 12, 30), dt.datetime(2025, 1, 1, 12, 0))],
        "a timestamp, b timestamp",
    )
    row = df.select(
        bq.timestamp_diff(F.col("a"), F.col("b"), "MINUTE").alias("m"),
        bq.timestamp_diff(F.col("a"), F.col("b"), "SECOND").alias("s"),
        bq.timestamp_diff(F.col("b"), F.col("a"), "MINUTE").alias("neg"),
        bq.timestamp_diff(F.col("a"), F.col("b"), "MILLISECOND").alias("ms"),
    ).collect()[0]
    assert (row.m, row.s, row.neg, row.ms) == (30, 1800, -30, 1_800_000)


def test_timestamp_sub_add(spark):
    df = spark.createDataFrame([(dt.datetime(2025, 1, 8),)], "ts timestamp")
    row = df.select(
        bq.timestamp_sub(F.col("ts"), 7, "DAY").alias("sub"),
        bq.timestamp_add(F.col("ts"), 24, "HOUR").alias("add"),
    ).collect()[0]
    assert row.sub == dt.datetime(2025, 1, 1)
    assert row.add == dt.datetime(2025, 1, 9)


def test_bq_timestamp_roundtrip(spark):
    df = spark.createDataFrame([("2025-03-01 08:15:30 UTC",)], "s string")
    row = df.select(
        bq.parse_bq_timestamp(F.col("s")).alias("ts")
    ).select(
        "ts", bq.format_bq_timestamp(F.col("ts")).alias("back")
    ).collect()[0]
    assert row.ts == dt.datetime(2025, 3, 1, 8, 15, 30)
    assert row.back == "2025-03-01 08:15:30 UTC"


def test_approx_quantiles_offset(spark):
    df = spark.range(101).select(F.col("id").cast("double").alias("x"))
    row = df.agg(bq.approx_quantiles(F.col("x"), 4).alias("q")).select(
        bq.offset(F.col("q"), 2).alias("median"),
        bq.offset(F.col("q"), 0).alias("lo"),
        bq.offset(F.col("q"), 4).alias("hi"),
    ).collect()[0]
    assert row.lo == 0.0 and row.hi == 100.0 and abs(row.median - 50.0) <= 1.0


def test_safe_divide(spark):
    df = spark.createDataFrame([(10.0, 2.0), (1.0, 0.0)], "a double, b double")
    got = [r.q for r in df.select(bq.safe_divide(F.col("a"), F.col("b")).alias("q")).collect()]
    assert got == [5.0, None]


def test_json_object(spark):
    import json

    df = spark.createDataFrame([(1, "x")], "a long, b string")
    s = df.select(
        bq.json_object(("id", F.col("a")), ("name", F.col("b"))).alias("j")
    ).collect()[0].j
    assert json.loads(s) == {"id": 1, "name": "x"}


def test_geohash_known_vectors(spark):
    # published examples: geohash.org / Wikipedia reference points
    cases = [
        (-5.6, 42.6, 5, "ezs42"),
        (10.40744, 57.64911, 11, "u4pruydqqvj"),
        (-74.0060, 40.7128, 7, "dr5regw"),  # NYC
    ]
    df = spark.createDataFrame(cases, "lon double, lat double, p int, want string")
    for lon, lat, p, want in cases:
        got = (
            df.filter(F.col("want") == want)
            .select(bq.geohash_of(F.col("lon"), F.col("lat"), p).alias("g"))
            .collect()[0]
            .g
        )
        assert got == want, f"geohash({lon},{lat},{p}) = {got}, want {want}"


def test_generate_uuid_shape(spark):
    rows = spark.range(5).select(bq.generate_uuid().alias("u")).collect()
    vals = {r.u for r in rows}
    assert len(vals) == 5
    assert all(len(v) == 36 and v.count("-") == 4 for v in vals)


def test_timestamp_diff_truncates_microsecond_difference(spark):
    """BigQuery truncates the MICROSECOND difference — not each operand
    to whole units: diff(..02.000, ..00.900, SECOND) = 1, not 2."""
    df = spark.createDataFrame(
        [
            (
                dt.datetime(2025, 1, 1, 0, 0, 2, 0),
                dt.datetime(2025, 1, 1, 0, 0, 0, 900_000),
            )
        ],
        "a timestamp, b timestamp",
    )
    row = df.select(
        bq.timestamp_diff(F.col("a"), F.col("b"), "SECOND").alias("s"),
        bq.timestamp_diff(F.col("b"), F.col("a"), "SECOND").alias("neg"),
        bq.timestamp_diff(F.col("a"), F.col("b"), "MILLISECOND").alias("ms"),
        bq.timestamp_diff(F.col("a"), F.col("b"), "MICROSECOND").alias("us"),
    ).collect()[0]
    # 1.1 s apart: SECOND truncates toward zero in BOTH directions
    assert (row.s, row.neg, row.ms, row.us) == (1, -1, 1100, 1_100_000)
