"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship star-join revenue query on sf0.001.
queries()       — every implemented operator from SURVEY.md §2 as a
                  (spark, sf_dir) -> DataFrame callable.
oracle_sql()    — matching DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from de_gcp_lakehouse_iceberg_spark.plans import ORACLE_SQL, QUERIES
from de_gcp_lakehouse_iceberg_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return QUERIES["q07_star_join_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omissions → rows-only check)."""
    return dict(ORACLE_SQL)
