"""Bucketed tables for co-located joins — the Spark counterpart of the
reference's CLUSTER BY data co-location (SURVEY.md §4: `CLUSTER BY
pickup_location_id, payment_type`, PRD.md:274,821).

Writing both sides of a recurring large-large join bucketed on the join
key removes the shuffle from EVERY subsequent join between them: the
scan is already hash-partitioned by bucket, so Catalyst plans
SortMergeJoin with zero Exchange. On a 100 TB fact table joined daily
against a 1 TB dimension, that is the single biggest recurring saving
available — the shuffle is paid once at write time, then amortized
forever.

Uses the session catalog (saveAsTable); `bucket_spec` must match on
both sides (same bucket count, same keys).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    num_buckets: int = 8,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) catalog table.

    Drops any prior incarnation first: a managed-table LOCATION left
    behind by a crashed writer (catalog entry gone, directory present)
    would otherwise fail every later overwrite with
    LOCATION_ALREADY_EXISTS — rerunnability beats the microseconds the
    extra DROP costs."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    # Managed-table layout: unqualified → <wh>/<tbl>; qualified db.tbl →
    # <wh>/<db>.db/<tbl> (a naive name.lower() join never matches the
    # qualified form, silently skipping the crash-leftover cleanup).
    parts = table_name.lower().split(".")
    if parts and parts[0] == "spark_catalog":
        parts = parts[1:]  # strip explicit catalog
    if len(parts) == 2 and parts[0] != "default":
        rel = os.path.join(f"{parts[0]}.db", parts[1])
    else:
        rel = parts[-1]
    stale = os.path.join(wh.removeprefix("file:"), rel)
    if os.path.isdir(stale):
        shutil.rmtree(stale, ignore_errors=True)
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_keys)
    )
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys —
    plans with no Exchange on either side (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
