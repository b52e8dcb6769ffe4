"""Hidden partition transforms: days()/bucket()/truncate() specs write
transformed partition layouts while queries keep filtering the RAW
column — the planner maps predicates through the transform."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.transforms import parse_spec


def test_parse_specs():
    t = parse_spec("days(ts)")
    assert (t.kind, t.source, t.name) == ("days", "ts", "ts_day")
    b = parse_spec("bucket(8, user_id)")
    assert (b.kind, b.source, b.arg, b.name) == (
        "bucket", "user_id", 8, "user_id_bucket"
    )
    assert parse_spec("day").kind == "identity"
    assert parse_spec("truncate(100, id)").name == "id_trunc"


def _events(spark, n=200):
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
            i % 13,
            float(i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_days_transform_layout_and_pruning(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "hp_days"), partition_by=["days(ts)"]
    )
    df = _events(spark)  # 200 hourly events -> 9 days
    t.append(df)
    parts = {f.partition["ts_day"] for f in t.snapshot().files}
    assert len(parts) == 9 and all(p.isdigit() for p in parts)
    # raw-column predicate prunes days the transform proves empty
    cut = dt.datetime(2024, 1, 8)  # last ~2 days
    _, planned = t.plan_files(where=[("ts", ">=", cut)])
    days_planned = {f.partition["ts_day"] for f in planned}
    assert len(days_planned) <= 3  # day of cut + following days only
    got = sorted(r.event_id for r in t.scan(where=[("ts", ">=", cut)]).collect())
    want = sorted(
        r.event_id for r in df.filter(F.col("ts") >= cut).collect()
    )
    assert got == want and got


def test_bucket_transform_equality_pruning(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "hp_bucket"), partition_by=["bucket(4, user_id)"]
    )
    df = _events(spark)
    t.append(df)
    buckets = {f.partition["user_id_bucket"] for f in t.snapshot().files}
    assert buckets == {"0", "1", "2", "3"}
    _, planned = t.plan_files(where=[("user_id", "=", 7)])
    assert {f.partition["user_id_bucket"] for f in planned} == {"3"}
    # range predicates must NOT prune through a hash bucket
    _, all_kept = t.plan_files(where=[("user_id", ">=", 7)])
    assert {f.partition["user_id_bucket"] for f in all_kept} == buckets
    got = t.scan(where=[("user_id", "=", 7)]).count()
    assert got == df.filter(F.col("user_id") == 7).count() > 0


def test_truncate_transform_range_pruning(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "hp_trunc"), partition_by=["truncate(50, event_id)"]
    )
    df = _events(spark)
    t.append(df)
    _, planned = t.plan_files(where=[("event_id", "<", 50)])
    assert {f.partition["event_id_trunc"] for f in planned} == {"0"}
    assert t.scan(where=[("event_id", "<", 50)]).count() == 50


def test_identity_spec_backcompat(spark, tmp_path):
    """Plain column names keep the original layout and semantics."""
    t = LakeTable.create(
        spark, str(tmp_path / "hp_ident"), partition_by=["day"]
    )
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id long, day string"
    )
    t.append(df)
    assert {f.partition["day"] for f in t.snapshot().files} == {
        "2024-01-01", "2024-01-02"
    }
