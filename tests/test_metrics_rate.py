"""Query-metrics recorder (M8/S9 parity) and the rate-controlled trip
stream (T8/B4 envelope)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse.metrics import QueryMetrics
from de_gcp_lakehouse_iceberg_spark.streaming.taxi import rate_trip_stream
from de_gcp_lakehouse_iceberg_spark.sources.ingest import classify_trips
from de_gcp_lakehouse_iceberg_spark.tables import table


def test_metrics_records_and_flags(spark, sf_dir, tmp_path):
    m = QueryMetrics(spark, str(tmp_path / "query_metrics"))
    rows = m.record("count_lineitem", table(spark, sf_dir, "lineitem").agg(F.count("*")))
    assert rows[0][0] > 0
    m.record("count_orders", table(spark, sf_dir, "orders").agg(F.count("*")))
    got = m.table.scan().collect()
    assert {r.query_name for r in got} == {"count_lineitem", "count_orders"}
    assert all(r.input_bytes > 0 and r.duration_s >= 0 for r in got)
    # nothing breaches the real thresholds on tiny data...
    assert m.analyze() == []
    # ...but the reference thresholds do fire when configured lower
    flagged = m.analyze(slow_seconds=0.0, expensive_bytes=1)
    assert len(flagged) == 2
    assert any("prune" in r for f in flagged for r in f["recommendations"])
    s = {r.query_name: r.runs for r in m.summary().collect()}
    assert s == {"count_lineitem": 1, "count_orders": 1}


def test_rate_trip_stream_flows_and_validates(spark, tmp_path):
    stream = rate_trip_stream(spark, rows_per_second=200)
    classified = classify_trips(stream, mode="streaming")
    q = (
        classified.writeStream.format("memory")
        .queryName("rate_trips")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.table("rate_trips").count()
            if n >= 50:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    out = spark.table("rate_trips")
    assert n >= 50  # B4: sustains the 50 msg/s envelope in a capture
    # every generated trip passes the reference validation rules
    assert out.filter(F.col("_error_type").isNotNull()).count() == 0
    one = out.first()
    assert one.payment_type in {"card", "cash", "no_charge", "dispute"}


def test_expensive_scan_flagged_by_planned_manifest_bytes(
    spark, sf_dir, tmp_path
):
    """M8 bytes rule (iceberg_maintenance.py:183-197: flag > 10 GB
    scanned), threshold scaled to fixture size: a full-table scan's
    MANIFEST-planned bytes must trip the flag with the bytes
    recommendation; a stats-pruned scan of the same table must not.
    The volume comes from table.plan_volume — planned file sizes the
    manifest already holds, zero filesystem stat calls."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable

    ev = table(spark, sf_dir, "events")
    t = LakeTable.create(spark, str(tmp_path / "ev_lake"))
    # range-layout on event_id so column-stats file skipping has
    # disjoint per-file ranges to prune on
    t.append(ev.repartitionByRange(8, "event_id"))

    full = t.plan_volume()
    assert full["files"] >= 8 and full["bytes"] > 0
    # the reference's 10 GB rule scaled to this fixture: half the table
    threshold = full["bytes"] // 2

    lo = ev.agg(F.expr("percentile(event_id, 0.05)")).first()[0]
    where = [("event_id", "<=", int(lo))]
    pruned = t.plan_volume(where=where)
    assert pruned["files"] < full["files"]
    assert pruned["bytes"] < threshold

    m = QueryMetrics(spark, str(tmp_path / "qm_bytes"))
    m.record("full_scan", t.scan().agg(F.count("*")), planned=full)
    m.record(
        "pruned_scan", t.scan(where=where).agg(F.count("*")), planned=pruned
    )
    flagged = m.analyze(slow_seconds=1e9, expensive_bytes=threshold)
    assert [f["query_name"] for f in flagged] == ["full_scan"]
    assert any("scans excessive data" in r for r in flagged[0]["recommendations"])
    # the recorded rows carry the planned volumes verbatim
    rec = {
        r["query_name"]: (r["input_bytes"], r["input_files"])
        for r in m.table.scan().collect()
    }
    assert rec["full_scan"] == (full["bytes"], full["files"])
    assert rec["pruned_scan"] == (pruned["bytes"], pruned["files"])
