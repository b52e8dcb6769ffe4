"""q59 — interval-join attribution: each purchase paired with the same
user's clicks in the preceding 30 minutes; hourly census of attributed
purchases. Exercises the interval_join operator's batch form; the
stream-stream form is pinned equal to it in tests/test_interval_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.interval_join import interval_join
from ..tables import table
from .queries import _davg, register

_WINDOW_S = 1800


@register(
    "q59_click_attribution",
    oracle=f"""
    WITH pairs AS (
      SELECT p.event_id, p.ts, p.value,
             CAST(count(*) AS BIGINT) AS n_clicks
      FROM events p
      JOIN events c
        ON c.user_id = p.user_id
       AND c.event_type = 'click'
       AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0
           AND {_WINDOW_S} * 1000000
      WHERE p.event_type = 'purchase'
      GROUP BY p.event_id, p.ts, p.value)
    SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS attributed_purchases,
           CAST(sum(n_clicks) AS BIGINT) AS click_pairs,
           floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 100 + 0.5) / 100 AS avg_value
    FROM pairs
    GROUP BY hour
    ORDER BY hour
    """,
)
def q59_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    pairs = interval_join(
        purchases,
        clicks,
        by=["user_id"],
        left_ts="ts",
        right_ts="c_ts",
        lower_seconds=_WINDOW_S,
    )
    per_purchase = pairs.groupBy("event_id", "ts", "value").agg(
        F.count("*").alias("n_clicks")
    )
    return (
        per_purchase.groupBy(F.hour("ts").cast("long").alias("hour"))
        .agg(
            F.count("*").alias("attributed_purchases"),
            F.sum("n_clicks").alias("click_pairs"),
            _davg("value", 2).alias("avg_value"),
        )
        .orderBy("hour")
    )
