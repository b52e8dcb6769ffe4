"""q75 — KMV distinct-count sketch vs exact, hash-gated. The portable
affine hash makes the ESTIMATE itself bit-identical across engines
(floor of a double division of exactly-representable integers), so
the sketch math — not just the row counts — is inside the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import kmv_estimate, kmv_sketch, kmv_sql
from ..tables import table
from .queries import register

_K = 64


@register(
    "q75_kmv_distinct",
    oracle=f"""
    WITH {kmv_sql('event_type', 'user_id', 'events', _K)},
    exact AS (
      SELECT event_type AS g,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1)
    SELECT e.g AS event_type,
           e.exact_distinct,
           CAST(s.distinct_est AS BIGINT) AS kmv_estimate
    FROM exact e JOIN est s ON e.g = s.g
    ORDER BY event_type
    """,
)
def q75_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    sk = kmv_estimate(
        kmv_sketch(events, ["event_type"], "user_id", k=_K), k=_K
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        exact.join(sk, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            F.col("distinct_est").alias("kmv_estimate"),
        )
        .orderBy("event_type")
    )
