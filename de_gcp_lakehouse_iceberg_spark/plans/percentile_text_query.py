"""q114 — BigQuery's ANALYTIC percentile spelling as pasted text:
`PERCENTILE_CONT(value, 0.5) OVER (PARTITION BY …)` (the reference's
PRD.md:853 Query-2 form) replayed VERBATIM through the SQL gateway,
which translates it to Spark's exact interpolating `percentile` window
aggregate. Closes the one documented Q15 dialect gap (VERDICT r8 #6):
a user pasting the PRD's analytic spelling now gets the same number
the ANSI WITHIN-GROUP form computes — and the DuckDB oracle re-derives
it with `quantile_cont`, so the translation is hash-gated, not just
unit-tested."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sql_gateway import SqlGateway
from ..tables import table
from .queries import register

BQ_SQL = """
SELECT DISTINCT
  CAST(EXTRACT(HOUR FROM ts) AS INT64) AS stat_hour,
  floor(PERCENTILE_CONT(value, 0.5)
          OVER (PARTITION BY EXTRACT(HOUR FROM ts))
        * 1000000 + 0.5) / 1000000 AS median_value,
  COUNT(*) OVER (PARTITION BY EXTRACT(HOUR FROM ts)) AS cnt
FROM `${PROJECT_ID}.${DATASET_ID}.events`
WHERE value > 0
ORDER BY stat_hour;
"""


@register(
    "q114_percentile_analytic_text",
    oracle="""
    SELECT CAST(extract(hour FROM ts) AS BIGINT) AS stat_hour,
           floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000
             AS median_value,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE value > 0
    GROUP BY 1
    ORDER BY 1
    """,
)
def q114_percentile_analytic_text(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    gw = SqlGateway(spark, {"events": table(spark, sf_dir, "events")})
    return gw.sql(BQ_SQL)
