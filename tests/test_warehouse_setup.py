"""Full taxi warehouse DDL parity: 6 typed tables, seeded zones, both
reference views queryable over real ingested data (the end-to-end
create_iceberg_tables.sql analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.sources import generator, ingest
from de_gcp_lakehouse_iceberg_spark.sources.warehouse_setup import (
    create_taxi_warehouse,
)


def _ingest(spark, wh, tmp_path, n=150):
    trips = generator.generate_trips(n, seed=42)
    generator.write_jsonl(trips, str(tmp_path / "in"))
    valid = ingest.valid_trips(
        ingest.classify_trips(ingest.read_jsonl(spark, str(tmp_path / "in") + "/*.jsonl"))
    )
    wh.table("taxi_trips").append(
        valid.withColumn("pickup_date", F.to_date("pickup_datetime").cast("string"))
    )
    return valid


def test_warehouse_tables_and_zones(spark, tmp_path):
    wh = create_taxi_warehouse(spark, str(tmp_path / "wh"))
    assert set(wh.table_names()) == {
        "taxi_trips",
        "hourly_trip_stats",
        "windowed_trip_stats",
        "taxi_zones",
        "processing_errors",
        "schema_evolution_log",
    }
    zones = wh.table("taxi_zones").scan()
    assert zones.count() == 15
    assert zones.filter(F.col("geometry").startswith("POINT(")).count() == 15
    # empty typed tables are scannable with their declared schema
    assert "error_type" in wh.table("processing_errors").scan().columns


def test_compat_view_and_zone_join(spark, tmp_path):
    wh = create_taxi_warehouse(spark, str(tmp_path / "wh"))
    _ingest(spark, wh, tmp_path)
    v1 = wh.query_view("taxi_trips_v1")
    assert v1.count() == 150
    assert "created_at" not in v1.columns  # the P10 narrow projection
    assert "pickup_date" not in v1.columns
    # README.md:548-557's zone join runs over warehouse SQL
    joined = wh.sql(
        """
        SELECT z.zone_name, count(*) AS trips, round(avg(t.total_amount), 2) AS avg_total
        FROM taxi_trips t JOIN taxi_zones z ON t.pickup_location_id = z.location_id
        GROUP BY z.zone_name ORDER BY trips DESC, z.zone_name
        """
    )
    rows = joined.collect()
    assert sum(r.trips for r in rows) == 150
    assert all(r.avg_total > 0 for r in rows)


def test_daily_zone_stats_view(spark, tmp_path):
    wh = create_taxi_warehouse(spark, str(tmp_path / "wh"))
    valid = _ingest(spark, wh, tmp_path)
    stats = wh.query_view("daily_zone_stats")
    total = stats.agg(F.sum("daily_trips")).collect()[0][0]
    assert total == 150
    # tip_percentage bounded; duration positive (F4 arg-order correct)
    row = stats.first()
    assert 0 <= row.tip_percentage <= 1
    assert row.avg_duration_minutes > 0
    # spot-check one group against direct aggregation
    direct = (
        valid.groupBy(F.to_date("pickup_datetime").alias("d"), "pickup_location_id")
        .agg(F.count("*").alias("c"))
        .first()
    )
    got = stats.filter(
        (F.col("stat_date") == direct.d)
        & (F.col("pickup_location_id") == direct.pickup_location_id)
    ).first()
    assert got.daily_trips == direct.c
