"""q99 — the SQL-TEXT surface under the driver hash gate: a
BigQuery-dialect query (backticked project.dataset.table name,
BigQuery DATE_TRUNC argument order, TIMESTAMP_SUB interval
arithmetic, COUNTIF, aliases in GROUP BY/HAVING — the constructs of
the reference's README.md:546-607 / verify_loaded_data.sql corpus)
executed VERBATIM through `sql_gateway.SqlGateway`. Proves a
reference user can paste their SQL, not just rebuild it on the
DataFrame API. Measures are order-independent (counts + min/max), so
the text needs no portability rewrites."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sql_gateway import SqlGateway
from ..tables import table
from .queries import register

BQ_SQL = """
SELECT
  DATE_TRUNC(o_orderdate, MONTH) as month_bucket,
  COUNT(*) as order_cnt,
  COUNTIF(o_orderstatus = 'F') as finished_cnt,
  MIN(o_totalprice) as min_price,
  MAX(o_totalprice) as max_price
FROM `${PROJECT_ID}.${DATASET_ID}.orders`
WHERE o_orderdate >= TIMESTAMP_SUB(TIMESTAMP '1997-01-01 00:00:00',
                                   INTERVAL 180 DAY)
GROUP BY month_bucket
HAVING order_cnt > 5
ORDER BY month_bucket;
"""


@register(
    "q99_bigquery_sql_text",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
             AS month_bucket,
           CAST(count(*) AS BIGINT) AS order_cnt,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS finished_cnt,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                         - INTERVAL 180 DAY
    GROUP BY 1
    HAVING count(*) > 5
    ORDER BY 1
    """,
)
def q99_bigquery_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    gw = SqlGateway(spark, {"orders": table(spark, sf_dir, "orders")})
    return gw.sql(BQ_SQL)
