"""q47/q48 — the remaining lakehouse surfaces as driver-gated queries:
S6 changelog scan and D6 schema evolution, each built live on a /tmp
warehouse from the driver's parquet, with the oracle describing the
expected end state directly over the source tables."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable, dml, evolution
from ..tables import table
from .queries import register
from .workdir import scratch

_WORK_ROOT = scratch("lakehouse_meta_queries")


def _root(name: str, sf_dir: str) -> str:
    root = os.path.join(
        _WORK_ROOT, name, os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(root, ignore_errors=True)
    return root


# --------------------------------------------------------------------------
# q47 — S6 change-history scan: two appends + one delete, then the
# changelog between first and last snapshot aggregated by change type.
# Oracle: INSERTs = second batch, DELETEs = rows the predicate removed.
# --------------------------------------------------------------------------
@register(
    "q47_changelog",
    oracle="""
    SELECT * FROM (
      SELECT 'DELETE' AS change_type,
             (SELECT CAST(count(*) AS BIGINT) FROM supplier
               WHERE s_suppkey % 2 = 0 AND s_nationkey < 5) AS row_count
      UNION ALL
      SELECT 'INSERT',
             (SELECT CAST(count(*) AS BIGINT) FROM supplier
               WHERE s_suppkey % 2 = 1)
    ) WHERE row_count > 0  -- a zero-match DML emits no changelog rows
    ORDER BY change_type
    """,
)
def q47_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    t = LakeTable.create(spark, _root("q47_supplier", sf_dir))
    t.append(sup.filter(F.col("s_suppkey") % 2 == 0))
    v_base = t.current_version()
    t.append(sup.filter(F.col("s_suppkey") % 2 == 1))
    dml.delete(t, (F.col("s_suppkey") % 2 == 0) & (F.col("s_nationkey") < 5))
    ch = dml.changelog(t, v_base, t.current_version())
    return (
        ch.groupBy(F.col("_change_type").alias("change_type"))
        .agg(F.count("*").alias("row_count"))
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# q48 — D6 schema evolution: metadata-only ADD COLUMN between appends;
# rows from pre-evolution files read NULL, post-evolution rows carry
# values (PRD.md:3421-3473).
# --------------------------------------------------------------------------
@register(
    "q48_schema_evolution",
    oracle="""
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM part) AS total_rows,
      (SELECT CAST(count(*) AS BIGINT) FROM part
        WHERE p_partkey % 3 = 0) AS rows_with_category,
      (SELECT CAST(count(*) AS BIGINT) FROM part
        WHERE p_partkey % 3 <> 0) AS rows_null_category,
      CAST(1 AS BIGINT) AS evolution_events
    """,
)
def q48_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")
    t = LakeTable.create(spark, _root("q48_part", sf_dir))
    t.append(part.filter(F.col("p_partkey") % 3 != 0))
    evolution.add_column(t, "category", "string")
    t.append(
        part.filter(F.col("p_partkey") % 3 == 0).withColumn(
            "category", F.lit("bulk")
        )
    )
    scanned = t.scan()
    n_events = evolution.evolution_log_df(t).count()
    return spark.createDataFrame(
        [
            (
                scanned.count(),
                scanned.filter(F.col("category").isNotNull()).count(),
                scanned.filter(F.col("category").isNull()).count(),
                n_events,
            )
        ],
        "total_rows long, rows_with_category long, rows_null_category long, "
        "evolution_events long",
    )


# --------------------------------------------------------------------------
# q49 — type-widening migration (PRD.md:1214-1229 "Evolution 7"):
# widen_column adds a DECIMAL(38,18) companion, backfills it with a
# copy-on-write UPDATE, publishes the *_precise compat view, and logs
# MODIFY_COLUMN. The query proves the migration: every row backfilled,
# zero value drift between old and widened column, exact totals through
# the view, and both evolution-log entries present.
# --------------------------------------------------------------------------
@register(
    "q49_widen_column",
    oracle="""
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM orders) AS total_rows,
      (SELECT CAST(count(*) AS BIGINT) FROM orders) AS backfilled_rows,
      CAST(0 AS BIGINT) AS mismatch_rows,
      (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         FROM orders) AS total_amount,
      CAST(2 AS BIGINT) AS evolution_events
    """,
)
def q49_widen_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..lakehouse import Warehouse

    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    wh = Warehouse(spark, _root("q49_wh", sf_dir))
    t = wh.create_table("orders_w")
    t.append(src)
    evolution.widen_column(t, "o_totalprice", "decimal(38,18)", warehouse=wh)
    base = t.scan()
    mismatches = base.filter(
        ~F.col("o_totalprice_precise").eqNullSafe(
            F.col("o_totalprice").cast("decimal(38,18)")
        )
    ).count()
    view = wh.query_view("orders_w_precise")
    agg = view.agg(
        F.count("*").alias("total_rows"),
        F.count("o_totalprice").alias("backfilled_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_amount"),
    ).first()
    n_events = evolution.evolution_log_df(t).count()
    return spark.createDataFrame(
        [
            (
                agg.total_rows,
                agg.backfilled_rows,
                mismatches,
                float(agg.total_amount),
                n_events,
            )
        ],
        "total_rows long, backfilled_rows long, mismatch_rows long, "
        "total_amount double, evolution_events long",
    )
