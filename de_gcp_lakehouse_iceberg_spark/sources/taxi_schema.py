"""Table schemas for the taxi lakehouse — StructTypes mirroring the
reference DDL (sql/create_iceberg_tables.sql:2-123): `taxi_trips` (fact),
`hourly_trip_stats`, `windowed_trip_stats`, `taxi_zones`,
`processing_errors`, `schema_evolution_log`.

Type mapping per SURVEY.md §1.3: STRING→StringType, INT64→LongType,
TIMESTAMP→TimestampType (UTC), NUMERIC→DecimalType(38,9). Money values
are rounded to 2dp and coordinates to 9dp at ingest (main.py:97-113),
matching the reference's write-side convention.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

NUMERIC = DecimalType(38, 9)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# sql/create_iceberg_tables.sql:2-30
TAXI_TRIPS = StructType(
    [
        _f("trip_id", StringType()),
        _f("vendor_id", LongType()),
        _f("pickup_datetime", TimestampType()),
        _f("dropoff_datetime", TimestampType()),
        _f("passenger_count", LongType()),
        _f("trip_distance", NUMERIC),
        _f("pickup_longitude", NUMERIC),
        _f("pickup_latitude", NUMERIC),
        _f("dropoff_longitude", NUMERIC),
        _f("dropoff_latitude", NUMERIC),
        _f("payment_type", StringType()),
        _f("fare_amount", NUMERIC),
        _f("extra", NUMERIC),
        _f("mta_tax", NUMERIC),
        _f("tip_amount", NUMERIC),
        _f("tolls_amount", NUMERIC),
        _f("total_amount", NUMERIC),
        _f("pickup_location_id", LongType()),
        _f("dropoff_location_id", LongType()),
        _f("created_at", TimestampType()),
    ]
)

# sql/create_iceberg_tables.sql:33-49
HOURLY_TRIP_STATS = StructType(
    [
        _f("stat_hour", TimestampType()),
        _f("pickup_location_id", LongType()),
        _f("trip_count", LongType()),
        _f("avg_fare_amount", NUMERIC),
        _f("avg_trip_distance", NUMERIC),
        _f("avg_trip_duration_minutes", NUMERIC),
        _f("total_revenue", NUMERIC),
        _f("created_at", TimestampType()),
    ]
)

# sql/create_iceberg_tables.sql:52-70 (adds window bounds)
WINDOWED_TRIP_STATS = StructType(
    list(HOURLY_TRIP_STATS.fields)
    + [_f("window_start", TimestampType()), _f("window_end", TimestampType())]
)

# sql/create_iceberg_tables.sql:73-87
TAXI_ZONES = StructType(
    [
        _f("location_id", LongType()),
        _f("zone_name", StringType()),
        _f("borough", StringType()),
        _f("geometry", StringType()),  # WKT point
    ]
)

# sql/create_iceberg_tables.sql:90-105 (dead-letter envelope,
# streaming_taxi_processor.py:200-208)
PROCESSING_ERRORS = StructType(
    [
        _f("error", StringType()),
        _f("record", StringType()),
        _f("error_type", StringType()),
        _f("pipeline_name", StringType()),
        _f("created_at", TimestampType()),
    ]
)

# sql/create_iceberg_tables.sql:108-123
SCHEMA_EVOLUTION_LOG = StructType(
    [
        _f("table_name", StringType()),
        _f("change_type", StringType()),
        _f("column_name", StringType()),
        _f("old_type", StringType()),
        _f("new_type", StringType()),
        _f("applied_at", TimestampType()),
    ]
)

# Raw JSONL input schema (pre-validation: everything arrives as-written;
# trip_id/event_timestamp optional — main.py:64-67,115-117)
TRIP_INPUT = StructType(
    [
        _f("trip_id", StringType()),
        _f("vendor_id", LongType()),
        _f("pickup_datetime", StringType()),
        _f("dropoff_datetime", StringType()),
        _f("passenger_count", LongType()),
        _f("trip_distance", StringType()),
        _f("pickup_longitude", StringType()),
        _f("pickup_latitude", StringType()),
        _f("dropoff_longitude", StringType()),
        _f("dropoff_latitude", StringType()),
        _f("payment_type", StringType()),
        _f("fare_amount", StringType()),
        _f("extra", StringType()),
        _f("mta_tax", StringType()),
        _f("tip_amount", StringType()),
        _f("tolls_amount", StringType()),
        _f("total_amount", StringType()),
        _f("pickup_location_id", LongType()),
        _f("dropoff_location_id", LongType()),
        _f("event_timestamp", StringType()),
    ]
)
