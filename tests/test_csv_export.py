"""S2 positional CSV scan and S14 parquet export, plus hypothesis
property tests for the validation classifier (SURVEY.md §5: the
randomized tier the reference lacks)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.sources import ingest
from de_gcp_lakehouse_iceberg_spark.sources.taxi_schema import TRIP_INPUT


def _csv_line(
    vendor=1, pickup="2025-03-01 08:00:00", dropoff="2025-03-01 08:30:00",
    pax="2", dist="3.5", total="25.00",
):
    row = [""] * 18
    row[0] = str(vendor)
    row[1], row[2] = pickup, dropoff
    row[3], row[4] = pax, dist
    row[5], row[6] = "-73.98", "40.75"
    row[9], row[10] = "-73.95", "40.78"
    row[11] = "card"
    row[12], row[13], row[14] = "20.00", "0.50", "0.50"
    row[15], row[16], row[17] = "3.00", "1.00", total
    return ",".join(row)


def test_csv_scan_positional_mapping(spark, tmp_path):
    p = tmp_path / "trips.csv"
    p.write_text(_csv_line() + "\n" + _csv_line(vendor=2, dist="-1") + "\n")
    df = ingest.read_nyc_csv(spark, str(p))
    rows = {r.vendor_id: r for r in df.collect()}
    assert rows[1].pickup_datetime == "2025-03-01T08:00:00"
    assert rows[1].dropoff_longitude == "-73.95"  # skips unused cols 7-8
    assert rows[1].trip_id.startswith("batch_1_2025-03-01")
    assert rows[1].payment_type == "card"
    # flows through the SAME validation pipeline as JSONL
    classified = ingest.classify_trips(df)
    by = {r["_error_type"]: 1 for r in classified.collect()}
    assert None in by and "validation_failed" in by


def test_export_parquet_roundtrip(spark, tmp_path):
    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("part")
    )
    out = str(tmp_path / "export")
    ingest.export_parquet(df, out, partition_by=["part"])
    back = spark.read.parquet(out)
    assert back.count() == 50
    assert back.filter("part = '1'").count() > 0


# ---------------------------------------------------------------------------
# hypothesis: the vectorized classifier agrees with a straight-line
# Python re-statement of the reference's rules on arbitrary records
# ---------------------------------------------------------------------------
def _expected_class(rec: dict) -> str | None:
    for f in ("pickup_datetime", "dropoff_datetime", "trip_distance", "total_amount"):
        if rec.get(f) is None:
            return "missing_field"

    def parse(s):
        try:
            return dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        except (ValueError, AttributeError):
            return None

    p, d = parse(rec["pickup_datetime"]), parse(rec["dropoff_datetime"])
    if p is None or d is None:
        return "invalid_timestamp_format"
    if p >= d:
        return "invalid_timestamp_order"
    if float(rec["trip_distance"]) <= 0 or float(rec["total_amount"]) <= 0:
        return "validation_failed"
    return None


_ts = st.one_of(
    st.none(),
    st.just("garbage"),
    st.datetimes(
        min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2026, 1, 1)
    ).map(lambda d: d.isoformat()),
)
_num = st.one_of(
    st.none(),
    st.floats(min_value=-100, max_value=100, allow_nan=False).map(
        lambda x: round(x, 4)
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    recs=st.lists(
        st.fixed_dictionaries(
            {
                "pickup_datetime": _ts,
                "dropoff_datetime": _ts,
                "trip_distance": _num,
                "total_amount": _num,
            }
        ),
        min_size=1,
        max_size=8,
    )
)
def test_classifier_matches_python_reference(spark, recs):
    rows = [
        {
            "trip_id": f"t{i}",
            "vendor_id": 1,
            "pickup_datetime": r["pickup_datetime"],
            "dropoff_datetime": r["dropoff_datetime"],
            "trip_distance": None
            if r["trip_distance"] is None
            else str(r["trip_distance"]),
            "total_amount": None
            if r["total_amount"] is None
            else str(r["total_amount"]),
        }
        for i, r in enumerate(recs)
    ]
    df = spark.createDataFrame(rows, TRIP_INPUT)
    got = {
        r["trip_id"]: r["_error_type"]
        for r in ingest.classify_trips(df).collect()
    }
    for i, r in enumerate(recs):
        assert got[f"t{i}"] == _expected_class(r), (i, r)


def test_multi_format_export_round_trip(spark, tmp_path):
    """S14 family: parquet / JSONL / ORC exports all round-trip the
    documents sample losslessly (JSONL via schema-pinned re-read)."""
    from de_gcp_lakehouse_iceberg_spark.sources.ingest import (
        export_jsonl,
        export_orc,
        export_parquet,
    )
    from de_gcp_lakehouse_iceberg_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    want = sorted(map(tuple, docs.collect()))

    pq, js, oc = (str(tmp_path / n) for n in ("pq", "jsonl", "orc"))
    export_parquet(docs, pq)
    export_jsonl(docs, js)
    export_orc(docs, oc)

    assert sorted(map(tuple, spark.read.parquet(pq).collect())) == want
    back_js = spark.read.schema(docs.schema).json(js)
    assert sorted(map(tuple, back_js.collect())) == want
    assert sorted(map(tuple, spark.read.orc(oc).collect())) == want
