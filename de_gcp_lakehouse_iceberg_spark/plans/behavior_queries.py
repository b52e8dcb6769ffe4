"""q77/q78 — behavioral analytics over the events stream: ordered
funnel completion and signup-cohort retention. Both are exact-integer
aggregations (counts and day arithmetic only), so the hash gate is
tight by construction.

q77 funnel: per user, step k counts as reached when its earliest
qualifying event is strictly after the earliest qualifying event of
step k−1 (the standard strict-order funnel; simultaneous timestamps
do not advance the funnel). One groupBy(user) with conditional MIN
aggregates — no self-joins, no explosion: the 100 TB shape.

q78 retention: cohort = day of the user's first `signup`; a user is
retained in week w when they have ANY event in [cohort + 7w days,
cohort + 7(w+1) days). One pass for cohorts (broadcastable — users,
not events), one join + distinct count per (cohort week, w).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .queries import register

_STEPS = ("view", "click", "purchase")
_US_PER_DAY = 86_400_000_000


@register(
    "q77_funnel",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = '{_STEPS[0]}' THEN ts END) AS t0,
             min(CASE WHEN event_type = '{_STEPS[1]}' THEN ts END) AS t1,
             min(CASE WHEN event_type = '{_STEPS[2]}' THEN ts END) AS t2
      FROM events GROUP BY user_id),
    flags AS (
      SELECT user_id,
             (t0 IS NOT NULL) AS s0,
             (t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0) AS s1,
             (t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
              AND t2 IS NOT NULL AND t2 > t1) AS s2
      FROM per_user)
    SELECT CAST(count(*) AS BIGINT) AS users_total,
           CAST(count(*) FILTER (WHERE s0) AS BIGINT) AS step1_view,
           CAST(count(*) FILTER (WHERE s1) AS BIGINT) AS step2_click,
           CAST(count(*) FILTER (WHERE s2) AS BIGINT) AS step3_purchase,
           floor(CAST(count(*) FILTER (WHERE s2) AS DOUBLE)
                 / count(*) FILTER (WHERE s0) * 1000000 + 0.5) / 1000000
             AS conversion
    FROM flags
    """,
)
def q77_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        *[
            F.min(
                F.when(F.col("event_type") == step, F.col("ts"))
            ).alias(f"t{i}")
            for i, step in enumerate(_STEPS)
        ]
    )
    s0 = F.col("t0").isNotNull()
    s1 = s0 & F.col("t1").isNotNull() & (F.col("t1") > F.col("t0"))
    s2 = s1 & F.col("t2").isNotNull() & (F.col("t2") > F.col("t1"))
    flags = per_user.select(
        s0.alias("s0"), s1.alias("s1"), s2.alias("s2")
    )
    cnt = lambda c: F.sum(F.col(c).cast("long"))  # noqa: E731
    return flags.agg(
        F.count("*").alias("users_total"),
        cnt("s0").alias("step1_view"),
        cnt("s1").alias("step2_click"),
        cnt("s2").alias("step3_purchase"),
        (
            F.floor(
                cnt("s2").cast("double") / cnt("s0") * 1_000_000
                + F.lit(0.5)
            )
            / 1_000_000
        ).alias("conversion"),
    )


@register(
    "q78_retention_cohorts",
    oracle=f"""
    WITH cohorts AS (
      SELECT user_id,
             CAST(min(floor(epoch_us(ts) / {_US_PER_DAY})) AS BIGINT)
               AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_day,
             CAST(floor((floor(epoch_us(e.ts) / {_US_PER_DAY})
                         - c.cohort_day) / 7) AS BIGINT) AS week
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
      WHERE floor(epoch_us(e.ts) / {_US_PER_DAY}) >= c.cohort_day),
    cohort_sizes AS (
      SELECT cohort_day // 7 AS cohort_week,
             CAST(count(*) AS BIGINT) AS cohort_users
      FROM cohorts GROUP BY 1)
    SELECT a.cohort_day // 7 AS cohort_week, a.week,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users,
           s.cohort_users
    FROM activity a
    JOIN cohort_sizes s ON a.cohort_day // 7 = s.cohort_week
    GROUP BY 1, 2, s.cohort_users
    ORDER BY cohort_week, week
    """,
)
def q78_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(_US_PER_DAY)).cast(
        "long"
    )
    cohorts = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(day).alias("cohort_day"))
    )
    ev_days = events.select("user_id", day.alias("d"))
    activity = (
        ev_days.join(F.broadcast(cohorts), "user_id")
        .filter(F.col("d") >= F.col("cohort_day"))
        .select(
            "user_id",
            "cohort_day",
            F.floor((F.col("d") - F.col("cohort_day")) / 7)
            .cast("long")
            .alias("week"),
        )
        .distinct()
    )
    sizes = cohorts.groupBy(
        (F.col("cohort_day") / 7).cast("long").alias("cohort_week")
    ).agg(F.count("*").alias("cohort_users"))
    return (
        activity.withColumn(
            "cohort_week", (F.col("cohort_day") / 7).cast("long")
        )
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .join(sizes, "cohort_week")
        .select("cohort_week", "week", "active_users", "cohort_users")
        .orderBy("cohort_week", "week")
    )
