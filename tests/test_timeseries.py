"""Hourly resample + gap fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from de_gcp_lakehouse_iceberg_spark.operators.timeseries import (
    resample_hourly,
)


def _ev(g, hour, v):
    return (g, dt.datetime(2024, 1, 1) + dt.timedelta(hours=hour), v)


def test_linear_interpolation_and_edges(spark):
    rows = [
        _ev("a", 0, 10.0),
        _ev("a", 3, 16.0),          # gap at 1, 2 → 12, 14
        _ev("b", 5, 7.0),
        _ev("b", 5, 9.0),           # same hour → mean 8.0
        _ev("b", 7, 2.0),           # gap at 6 → (8+2)/2 = 5
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {
        (r.event_type, r.h): (r.observed, r.filled, r.is_gap)
        for r in resample_hourly(df).collect()
    }
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    h0 = int(base.timestamp()) // 3600

    assert out[("a", h0 + 0)] == (10.0, 10.0, False)
    assert out[("a", h0 + 1)] == (None, 12.0, True)
    assert out[("a", h0 + 2)] == (None, 14.0, True)
    assert out[("a", h0 + 3)] == (16.0, 16.0, False)
    assert out[("b", h0 + 5)] == (8.0, 8.0, False)
    assert out[("b", h0 + 6)] == (None, 5.0, True)
    assert out[("b", h0 + 7)] == (2.0, 2.0, False)
    # grid spans exactly [min, max] per group
    assert len([k for k in out if k[0] == "a"]) == 4
    assert len([k for k in out if k[0] == "b"]) == 3


def test_single_observation_group(spark):
    df = spark.createDataFrame(
        [_ev("solo", 4, 42.0)],
        "event_type string, ts timestamp, value double",
    )
    out = resample_hourly(df).collect()
    assert len(out) == 1
    assert out[0].filled == 42.0 and out[0].is_gap is False
