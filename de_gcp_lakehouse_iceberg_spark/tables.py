"""Testdata table access (TESTDATA.md).

One parquet file per table under a scale-factor directory. Reads are
schema-on-file (parquet carries the schema); Catalyst prunes columns and
pushes filters into the scan, so callers should NOT pre-select — declare
the full plan and let the optimizer cut the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor — these
# grow sublinearly (region/nation are fixed) so broadcast hints are safe
# even at 100 TB fact-table scale.
BROADCAST_SAFE = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    # Reference semantics are UTC-everything (sql/create_iceberg_tables.sql
    # timestamps); pin the session so results don't shift under a caller
    # session configured for another zone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects. Read nanos as long (legacy conf, runtime-settable) and
    convert with integer division — `ts div 1000` stays in long space, no
    double round-trip (nanos ~1.7e18 exceed double's 2^53 exact range)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TESTDATA_TABLES}
