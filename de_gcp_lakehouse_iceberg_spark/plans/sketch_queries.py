"""q75 — KMV distinct-count sketch vs exact, hash-gated. The portable
affine hash makes the ESTIMATE itself bit-identical across engines
(floor of a double division of exactly-representable integers), so
the sketch math — not just the row counts — is inside the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import SAMPLE_P, id_hash_sql
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


# --------------------------------------------------------------------------
# q101 — sliding-window distinct users from MERGEABLE hourly KMV
# sketches: the pre-aggregated rollup pattern. Raw events are sketched
# ONCE per hour; every 6-hour window's estimate comes from merging six
# ≤k-hash sketches (min-k of the union == min-k of per-hour min-ks) —
# at 100 TB the window sweep touches hours x k hashes, never re-scans
# events. Exact per-window distincts ride alongside so the gate pins
# the estimator against truth; only COMPLETE windows are emitted.
# --------------------------------------------------------------------------
_WIN = 6


@register(
    "q101_sliding_distinct_kmv",
    oracle=f"""
    WITH hourly AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h,
             {id_hash_sql('user_id')} AS hh
      FROM events),
    bounds AS (
      SELECT min(h) AS lo, max(h) AS hi
      FROM (SELECT DISTINCT date_trunc('hour', ts) AS h FROM events)),
    assigned AS (
      SELECT DISTINCT h + i.i * INTERVAL 1 HOUR AS win, hh
      FROM hourly, unnest(range({_WIN})) AS i(i)),
    ranked AS (
      SELECT win, hh,
             row_number() OVER (PARTITION BY win ORDER BY hh) AS rn
      FROM assigned),
    sk AS (
      SELECT win, count(*) AS n, max(hh) AS kth
      FROM ranked WHERE rn <= {_K} GROUP BY win),
    est AS (
      SELECT win,
             CASE WHEN n < {_K} THEN n
                  ELSE CAST(floor(CAST({(_K - 1) * SAMPLE_P} AS DOUBLE) / kth) AS BIGINT)
             END AS kmv_estimate
      FROM sk),
    eassigned AS (
      SELECT date_trunc('hour', ts) + i.i * INTERVAL 1 HOUR AS win,
             user_id
      FROM events, unnest(range({_WIN})) AS i(i)),
    exact AS (
      SELECT win, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM eassigned GROUP BY win)
    SELECT CAST(e.win AS TIMESTAMP) AS window_end,
           e.exact_distinct,
           s.kmv_estimate
    FROM exact e
    JOIN est s ON e.win = s.win, bounds b
    WHERE e.win >= b.lo + {_WIN - 1} * INTERVAL 1 HOUR AND e.win <= b.hi
    ORDER BY window_end
    """,
)
def q101_sliding_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events").withColumn(
        "h", F.date_trunc("hour", F.col("ts"))
    )
    hourly = kmv_sketch(events, ["h"], "user_id", k=_K)
    step = F.expr("INTERVAL 1 HOUR")
    assigned = hourly.select(
        F.explode(
            F.sequence(
                F.col("h"),
                F.col("h") + F.expr(f"INTERVAL {_WIN - 1} HOUR"),
                step,
            )
        ).alias("win"),
        F.explode_outer(F.col("hashes")).alias("hh"),
    )
    # re-take the min-k of the unioned hour sketches per window
    merged = (
        assigned.groupBy("win")
        .agg(
            F.slice(F.array_sort(F.collect_set("hh")), 1, _K).alias("hashes")
        )
    )
    est = kmv_estimate(merged.withColumnRenamed("win", "g"), k=_K)
    exact = (
        events.select(
            F.explode(
                F.sequence(
                    F.col("h"),
                    F.col("h") + F.expr(f"INTERVAL {_WIN - 1} HOUR"),
                    step,
                )
            ).alias("win"),
            "user_id",
        )
        .groupBy("win")
        .agg(F.countDistinct("user_id").alias("exact_distinct"))
    )
    bounds = events.agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    return (
        exact.join(est.withColumnRenamed("g", "win"), "win")
        .crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("win") >= F.col("lo") + F.expr(f"INTERVAL {_WIN - 1} HOUR"))
            & (F.col("win") <= F.col("hi"))
        )
        .select(
            F.col("win").alias("window_end"),
            "exact_distinct",
            F.col("distinct_est").alias("kmv_estimate"),
        )
        .orderBy("window_end")
    )
