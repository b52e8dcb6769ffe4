"""q89 — semi-structured JSON extraction (the read side of the engine's
JSON surface; F21 covers construction): parse `events.props` JSON
strings JVM-side with get_json_object, extract the numeric field, and
aggregate per event type. DuckDB's json extension is the oracle.

Scale: get_json_object is a codegen'd path-expression over the string —
no UDF, no shuffle beyond the final aggregate; malformed/missing JSON
yields NULL and is counted, not dropped."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .queries import _davg, register


@register(
    "q89_json_extract",
    oracle="""
    WITH parsed AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS k_sum,
           CAST(count(DISTINCT k) AS BIGINT) AS k_distinct,
           floor(CAST(sum(CAST(k AS DECIMAL(18,2))) AS DOUBLE)
                 / count(k) * 100 + 0.5) / 100 AS k_avg
    FROM parsed
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q89_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    parsed = events.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.countDistinct("k").alias("k_distinct"),
            (
                F.floor(
                    F.sum(F.col("k").cast("decimal(18,2)")).cast("double")
                    / F.count("k")
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("k_avg"),
        )
        .orderBy("event_type")
    )
