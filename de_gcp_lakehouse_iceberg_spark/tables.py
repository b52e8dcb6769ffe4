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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Dtype-dispatch for the events `ts` column — the testdata has shipped
    it as both TIMESTAMP(NANOS) (read as long under the legacy conf) and
    timestamp[us] (read as TIMESTAMP_NTZ). Normalize every variant to a
    session-TZ TIMESTAMP so downstream code (unix_micros, window(),
    watermarks) sees one type regardless of which file vintage is on disk.

    - bigint  : nanos-as-long → integer `div 1000` (stays in long space;
      nanos ~1.7e18 exceed double's 2^53 exact range) → timestamp_micros.
    - timestamp_ntz : cast to timestamp. The session TZ is pinned UTC
      (table(), read_events_stream), so the cast preserves instants.
    - timestamp : already right.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has carried TIMESTAMP(NANOS) — which Spark's
    vectorized reader rejects without nanosAsLong — and, in newer testdata
    vintages, timestamp[us] (TIMESTAMP_NTZ). Set the legacy conf so nanos
    files still load, then let normalize_events_ts dispatch on whatever
    dtype actually arrived."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TESTDATA_TABLES}
