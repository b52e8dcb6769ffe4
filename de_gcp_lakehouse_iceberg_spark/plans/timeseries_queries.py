"""q76 — hourly resample + gap fill over the events stream
(operators/timeseries.resample_hourly), hash-gated per event type:
grid size, observed/gap hour counts, and an exact-decimal checksum of
the FILLED series (so the interpolation arithmetic itself is inside
the gate — one wrong neighbor or a half-open window flips it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import resample_hourly
from ..tables import table
from .queries import _dsum, _r, register


@register(
    "q76_resample_gapfill",
    oracle="""
    WITH hours AS (
      SELECT event_type AS g,
             CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
             value AS v
      FROM events),
    hourly AS (
      SELECT g, h,
             floor(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) * 1000000 + 0.5) / 1000000 AS observed
      FROM hours GROUP BY g, h),
    bounds AS (SELECT g, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY g),
    grid AS (
      SELECT g, unnest(range(lo, hi + 1)) AS h FROM bounds),
    joined AS (
      SELECT grid.g, grid.h, hourly.observed
      FROM grid LEFT JOIN hourly USING (g, h)),
    nb AS (
      SELECT g, h, observed,
             last_value(CASE WHEN observed IS NOT NULL
                             THEN struct_pack(h := h, o := observed) END
                        IGNORE NULLS)
               OVER (PARTITION BY g ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev,
             first_value(CASE WHEN observed IS NOT NULL
                              THEN struct_pack(h := h, o := observed) END
                         IGNORE NULLS)
               OVER (PARTITION BY g ORDER BY h
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nxt
      FROM joined),
    filled AS (
      SELECT g, h, observed,
             CASE WHEN observed IS NOT NULL THEN observed
                  ELSE floor(
                    (CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                          THEN prev.o + (nxt.o - prev.o) * (h - prev.h)
                               / (nxt.h - prev.h)
                          ELSE coalesce(prev.o, nxt.o) END)
                    * 1000000 + 0.5) / 1000000
             END AS filled
      FROM nb)
    SELECT g AS event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(count(observed) AS BIGINT) AS observed_hours,
           CAST(count(*) - count(observed) AS BIGINT) AS gap_hours,
           floor(CAST(sum(CAST(filled AS DECIMAL(18,6))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS filled_checksum
    FROM filled
    GROUP BY g
    ORDER BY event_type
    """,
)
def q76_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    series = resample_hourly(events)
    return (
        series.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.count("observed").alias("observed_hours"),
            (F.count("*") - F.count("observed")).alias("gap_hours"),
            _r(_dsum("filled", scale=6), 2).alias("filled_checksum"),
        )
        .orderBy("event_type")
    )
