"""Regression: datetime→micros conversion in stats pruning must be
EXACT integer arithmetic. The old float path
(int(total_seconds()*1e6)) truncates ~25-50% of microsecond values
down by 1µs (double resolution at 2024 epochs is ~0.4µs), so a file
bound and a predicate literal could round differently and scan(where=)
could prune a file that holds matching rows."""

from __future__ import annotations

import datetime as dt

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.table import _stat_value
from de_gcp_lakehouse_iceberg_spark.lakehouse.transforms import parse_spec

_EPOCH = dt.datetime(1970, 1, 1)


def _exact_us(v: dt.datetime) -> int:
    return (v - _EPOCH) // dt.timedelta(microseconds=1)


def test_stat_value_exact_for_all_microsecond_offsets():
    base = dt.datetime(2024, 7, 3, 12, 34, 56)
    for step in range(2000):
        v = base + dt.timedelta(microseconds=step * 499)
        assert _stat_value(v) == _exact_us(v), v


def test_transform_apply_exact_for_all_microsecond_offsets():
    days = parse_spec("days(ts)")
    hours = parse_spec("hours(ts)")
    # values straddling a day boundary at 1µs resolution: the float
    # path could push midnight-1µs into the NEXT day bucket (or
    # midnight into the previous), mispruning boundary partitions
    midnight = dt.datetime(2024, 7, 4)
    for off in (-2, -1, 0, 1, 2):
        v = midnight + dt.timedelta(microseconds=off)
        us = _exact_us(v)
        assert days.apply(v) == us // 86_400_000_000
        assert hours.apply(v) == us // 3_600_000_000
    base = dt.datetime(2024, 7, 3, 23, 59, 59)
    for step in range(1000):
        v = base + dt.timedelta(microseconds=step * 997)
        assert days.apply(v) == _exact_us(v) // 86_400_000_000


def test_equality_scan_at_microsecond_precision(spark, tmp_path):
    # end-to-end: µs-precision timestamps survive footer→manifest→prune
    # round-trip; an equality predicate at the file's exact max bound
    # must keep the file and return the row
    rows = [
        (1, dt.datetime(2024, 7, 3, 12, 0, 0, 123457)),
        (2, dt.datetime(2024, 7, 3, 12, 0, 0, 999999)),
    ]
    t = LakeTable.create(spark, str(tmp_path / "ustbl"))
    t.append(
        spark.createDataFrame(rows, "id long, ts timestamp").coalesce(1)
    )
    bound = rows[1][1]
    _, planned = t.plan_files(where=[("ts", "=", bound)])
    assert len(planned) == 1
    assert t.scan(where=[("ts", "=", bound)]).count() == 1
    # strictly-after the max bound: provably empty, file pruned
    after = bound + dt.timedelta(microseconds=1)
    _, none = t.plan_files(where=[("ts", ">", after)])
    assert none == []
