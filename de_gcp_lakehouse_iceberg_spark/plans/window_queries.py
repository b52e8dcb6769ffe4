"""Remaining window/scalar operator shapes from SURVEY.md §2:
A12 aggregate-of-aggregate window, W2 ROW_NUMBER synthetic ids,
F24 geohash generated columns (closed-form SQL oracle generated from
the same constants as the Column implementation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.bigquery_shim import _GEOHASH_ALPHABET, geohash_of
from ..tables import table
from .queries import _r, register


# --------------------------------------------------------------------------
# q26 — A12: AVG(COUNT(*)) OVER (PARTITION BY ...) — aggregate first,
# then window over the aggregate (PRD.md:5420-5429).
# --------------------------------------------------------------------------
@register(
    "q26_agg_of_agg_window",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, hour_of_day
    )
    SELECT event_type, hour_of_day, cnt,
           floor(avg(cnt) OVER (PARTITION BY event_type) * 10000 + 0.5)
             / 10000 AS avg_hourly_cnt,
           floor(cnt / avg(cnt) OVER (PARTITION BY event_type) * 10000 + 0.5)
             / 10000 AS load_ratio
    FROM hourly
    ORDER BY event_type, hour_of_day
    """,
)
def q26_agg_of_agg_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").alias("hour_of_day"))
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("event_type")
    return (
        hourly.select(
            "event_type",
            "hour_of_day",
            "cnt",
            _r(F.avg("cnt").over(w), 4).alias("avg_hourly_cnt"),
            _r(F.col("cnt") / F.avg("cnt").over(w), 4).alias("load_ratio"),
        )
        .orderBy("event_type", "hour_of_day")
    )


# --------------------------------------------------------------------------
# q28 — A7: STDDEV (PRD.md:5228). Engines disagree bitwise on streaming
# variance algorithms, so the sample stddev is derived from EXACT
# decimal sums: sqrt((Σx² − (Σx)²/n)/(n−1)) — identical doubles in.
# --------------------------------------------------------------------------
@register(
    "q28_stddev",
    oracle="""
    WITH sums AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))
                      * CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS s2
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           floor(sqrt((s2 - s1 * s1 / n) / (n - 1)) * 10000 + 0.5) / 10000
             AS stddev_price
    FROM sums
    ORDER BY o_orderpriority
    """,
)
def q28_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    d2 = F.col("o_totalprice").cast("decimal(18,2)")
    d4 = F.col("o_totalprice").cast("decimal(28,4)")
    sums = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(d2).cast("double").alias("s1"),
            F.sum(d4 * d4).cast("double").alias("s2"),
        )
    )
    std = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    return sums.select(
        "o_orderpriority", "n", _r(std, 4).alias("stddev_price")
    ).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# q27 — W2: ROW_NUMBER() synthetic ids over a deterministic order
# (PRD.md:743's staging-id pattern).
# --------------------------------------------------------------------------
@register(
    "q27_row_number_ids",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY s_name, s_suppkey) AS BIGINT)
             AS synthetic_id,
           s_suppkey, s_name
    FROM supplier
    ORDER BY synthetic_id
    LIMIT 20
    """,
)
def q27_row_number_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "supplier")
        .select(
            F.row_number()
            .over(W.orderBy("s_name", "s_suppkey"))
            .cast("long")
            .alias("synthetic_id"),
            "s_suppkey",
            "s_name",
        )
        .orderBy("synthetic_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q43 — F24: geohash generated column (PRD.md:1074-1079). Coordinates
# derived deterministically from c_custkey; the oracle recomputes the
# SAME closed-form geohash (scaled-coordinate binary expansion) in SQL
# generated from the Python constants — no geohash builtin needed.
# --------------------------------------------------------------------------
_GEO_PRECISION = 5


def _geohash_sql(lon_expr: str, lat_expr: str, precision: int) -> str:
    total = 5 * precision
    n_lon = (total + 1) // 2
    n_lat = total // 2
    lon_idx = (
        f"least(CAST(floor(({lon_expr} + 180.0) / 360.0 * {1 << n_lon}) AS BIGINT),"
        f" {(1 << n_lon) - 1})"
    )
    lat_idx = (
        f"least(CAST(floor(({lat_expr} + 90.0) / 180.0 * {1 << n_lat}) AS BIGINT),"
        f" {(1 << n_lat) - 1})"
    )
    chars = []
    for g in range(precision):
        terms = []
        for j in range(5):
            i = g * 5 + j  # global bit index, MSB-first interleaved
            if i % 2 == 0:
                bit = f"((li >> {n_lon - 1 - i // 2}) & 1)"
            else:
                bit = f"((la >> {n_lat - 1 - i // 2}) & 1)"
            terms.append(f"{bit} * {2 ** (4 - j)}")
        idx = " + ".join(terms)
        chars.append(
            f"substr('{_GEOHASH_ALPHABET}', CAST({idx} AS INTEGER) + 1, 1)"
        )
    concat = " || ".join(chars)
    return f"(SELECT {concat} FROM (SELECT {lon_idx} AS li, {lat_idx} AS la) _g)"


@register(
    "q43_geohash_buckets",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 360 AS DOUBLE) - 180.0 + 0.5 AS lon,
             CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.5 AS lat
      FROM customer
    ),
    hashed AS (
      SELECT c_custkey,
             {_geohash_sql('lon', 'lat', _GEO_PRECISION)} AS geohash
      FROM pts
    )
    SELECT substr(geohash, 1, 2) AS geo_prefix,
           CAST(count(*) AS BIGINT) AS point_count,
           CAST(count(DISTINCT geohash) AS BIGINT) AS distinct_cells
    FROM hashed
    GROUP BY geo_prefix
    ORDER BY point_count DESC, geo_prefix
    LIMIT 15
    """,
)
def q43_geohash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 360).cast("double") - 180.0 + 0.5).alias("lon"),
        ((F.col("c_custkey") % 180).cast("double") - 90.0 + 0.5).alias("lat"),
    )
    hashed = pts.select(
        "c_custkey",
        geohash_of(F.col("lon"), F.col("lat"), _GEO_PRECISION).alias("geohash"),
    )
    return (
        hashed.groupBy(F.substring("geohash", 1, 2).alias("geo_prefix"))
        .agg(
            F.count("*").alias("point_count"),
            F.countDistinct("geohash").alias("distinct_cells"),
        )
        .orderBy(F.desc("point_count"), F.asc("geo_prefix"))
        .limit(15)
    )
