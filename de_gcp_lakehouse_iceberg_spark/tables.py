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


def table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    spread_corpus: bool = True,
) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    # Reference semantics are UTC-everything (sql/create_iceberg_tables.sql
    # timestamps); pin the session so results don't shift under a caller
    # session configured for another zone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _read_events(spark, sf_dir)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # The corpus tables feed regex chains, token explodes, and Arrow
    # signing UDFs — per-row work heavy enough that scan parallelism IS
    # the query's parallelism. Their single-file fixtures carry almost
    # no row groups (sf0.1: 1 split; sf3: 7), and Spark cannot split a
    # parquet scan below row-group granularity, so without this guard
    # the expensive stage of every corpus query ran on a fraction of
    # the executor slots (q66's redaction chain at sf3: 18 s → ~4 s
    # with the guard). Relational tables stay as scanned: their per-row
    # work is plain columnar arithmetic, where an extra exchange costs
    # about what it saves. At 100 TB file counts give natural fan-out
    # and spread() no-ops — it keys on the measured split count.
    # spread_corpus=False opts a pipeline out — for operators whose
    # CONTRACT is the exchange count itself (q71's one-shuffle shard,
    # q79's zero-shuffle scan-time split assignment): their per-row
    # work is a single hash, so scan fan-out buys nothing and the
    # extra exchange would break the plan shape their tests pin.
    if spread_corpus and name == "documents":
        return spread(df, "doc_id")
    if spread_corpus and name == "embeddings":
        return spread(df, "vec_id")
    return df


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


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Raise a narrow scan's parallelism to the session's core count
    before a compute-heavy projection.

    The corpus parquet files carry only a handful of row groups (the
    sf3 `documents` file splits into 7 tasks), and Spark cannot split
    a scan below row-group granularity — so a regex chain, token
    explode, or signing UDF over the raw scan runs on a fraction of
    the executor slots no matter what `maxPartitionBytes` says. One
    narrow repartition (corpus-bytes-sized, trivially parallel) buys
    full fan-out for the expensive stage above it; measured on q66's
    redaction chain at sf3: 18 s → ~4 s including the shuffle. No-op
    when the scan already splits to ≥ the core count (every relational
    table at every SF — their files carry enough row groups). At
    100 TB the same guard holds: file counts give natural parallelism
    and this becomes a no-op, which is why it keys on the MEASURED
    partition count, not the SF.
    """
    cpus = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cpus:
        return df
    return df.repartition(cpus, *keys) if keys else df.repartition(cpus)
