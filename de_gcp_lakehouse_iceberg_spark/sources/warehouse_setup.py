"""Taxi warehouse DDL — the engine's counterpart of the reference's
table-creation script (sql/create_iceberg_tables.sql): the six base
tables with their partition/cluster layout, the 15 seed zone rows
(S15), the `taxi_trips_v1` backward-compat projection (P10/D7,
:146-167) and the `daily_zone_stats` aggregate view (Q10, :170-184).

The view SQL below is the Spark-dialect translation of the reference
definitions — TIMESTAMP_DIFF(a,b,MINUTE) becomes timestampdiff with
flipped argument order (SURVEY.md F4), everything else maps 1:1.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..lakehouse import Warehouse
from . import taxi_schema
from .generator import zones_rows

# per-table partition layout (D1: PARTITION BY DATE(pickup_datetime);
# partition columns materialized at write per SURVEY.md §4 generated-
# columns note) and sort/cluster columns (CLUSTER BY →
# maintenance.rewrite_sorted order, B14)
TABLE_SPECS: dict[str, dict] = {
    "taxi_trips": {
        "schema": taxi_schema.TAXI_TRIPS,
        "partition_by": ["pickup_date"],
        "sort_columns": ["pickup_location_id", "payment_type"],
    },
    "hourly_trip_stats": {
        "schema": taxi_schema.HOURLY_TRIP_STATS,
        "partition_by": [],
        "sort_columns": ["stat_hour", "pickup_location_id"],
    },
    "windowed_trip_stats": {
        "schema": taxi_schema.WINDOWED_TRIP_STATS,
        "partition_by": [],
        "sort_columns": ["window_start", "pickup_location_id"],
    },
    "taxi_zones": {"schema": taxi_schema.TAXI_ZONES, "partition_by": []},
    "processing_errors": {
        "schema": taxi_schema.PROCESSING_ERRORS,
        "partition_by": [],
    },
    "schema_evolution_log": {
        "schema": taxi_schema.SCHEMA_EVOLUTION_LOG,
        "partition_by": [],
    },
}

TAXI_TRIPS_V1_SQL = """
SELECT trip_id, vendor_id, pickup_datetime, dropoff_datetime,
       passenger_count, trip_distance,
       pickup_longitude, pickup_latitude,
       dropoff_longitude, dropoff_latitude,
       payment_type, fare_amount, extra, mta_tax, tip_amount,
       tolls_amount, total_amount,
       pickup_location_id, dropoff_location_id
FROM taxi_trips
"""

DAILY_ZONE_STATS_SQL = """
SELECT DATE(pickup_datetime) AS stat_date,
       pickup_location_id,
       COUNT(*) AS daily_trips,
       SUM(total_amount) AS daily_revenue,
       AVG(fare_amount) AS avg_fare,
       AVG(trip_distance) AS avg_distance,
       AVG(timestampdiff(MINUTE, pickup_datetime, dropoff_datetime))
         AS avg_duration_minutes,
       COUNT(DISTINCT payment_type) AS payment_type_variety,
       SUM(CASE WHEN tip_amount > 0 THEN 1 ELSE 0 END) / COUNT(*)
         AS tip_percentage
FROM taxi_trips
WHERE pickup_datetime >= '2020-01-01'
GROUP BY stat_date, pickup_location_id
"""


def create_taxi_warehouse(spark: SparkSession, root: str) -> Warehouse:
    """Stand up the full reference warehouse: 6 tables (typed, empty),
    seeded zones, both views."""
    wh = Warehouse(spark, root)
    for name, spec in TABLE_SPECS.items():
        from pyspark.sql.types import StringType, StructField, StructType

        # materialized partition columns join the declared schema (the
        # reference's DATE(pickup_datetime) hidden-partition analog).
        # Copy first — StructType.add mutates the shared schema object.
        schema = StructType(list(spec["schema"].fields))
        for pcol in spec["partition_by"]:
            if pcol not in schema.fieldNames():
                schema = StructType(
                    list(schema.fields) + [StructField(pcol, StringType(), True)]
                )
        t = wh.create_table(
            name,
            partition_by=spec["partition_by"],
            schema_json=schema.json(),
        )
        if name == "taxi_zones":
            t.append(spark.createDataFrame(zones_rows(), spec["schema"]))
    wh.create_view("taxi_trips_v1", TAXI_TRIPS_V1_SQL)
    wh.create_view("daily_zone_stats", DAILY_ZONE_STATS_SQL)
    return wh
