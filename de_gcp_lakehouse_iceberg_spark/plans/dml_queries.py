"""DML / time-travel query shapes (SURVEY.md §2.13 Q19-Q21) executed
through the real lakehouse table layer: each query materializes a
LakeTable under /tmp from the driver's parquet, runs the mutation
(MERGE / DELETE+UPDATE / multi-snapshot append), and returns the
post-DML state. The DuckDB oracle expresses the same final state
directly over the source tables — so the copy-on-write machinery, not
just the arithmetic, is what's being checked.

Reference parity: MERGE fare-fix PRD.md:769-779 (D3); DELETE purge
PRD.md:782-787 (D5); UPDATE recode PRD.md:790-797 (D4); time travel
verify_loaded_data.sql:108-110 (S5/Q21).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable, dml
from ..tables import table
from .queries import _dsum, register
from .workdir import scratch

_WORK_ROOT = scratch("lakehouse_dml_queries")


def _fresh_table(
    spark: SparkSession, name: str, sf_dir: str, df: DataFrame, partition_by=None
) -> LakeTable:
    root = os.path.join(
        _WORK_ROOT, name, os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(spark, root, partition_by=partition_by)
    t.append(df)
    return t


# --------------------------------------------------------------------------
# q19 — MERGE: recode status of high-value orders (matched update) and
# insert a synthetic order per priority class (not-matched insert), then
# report per-status counts/revenue. (D3)
# --------------------------------------------------------------------------
@register(
    "q19_merge_fix",
    oracle="""
    WITH merged AS (
      SELECT o_orderkey,
             CASE WHEN o_totalprice > 400000 THEN 'R' ELSE o_orderstatus END
               AS o_orderstatus,
             o_totalprice
      FROM orders
      UNION ALL
      SELECT -(1 + row_number() OVER (ORDER BY o_orderpriority)),
             'N',
             100.0
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS order_count,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_revenue
    FROM merged
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q19_merge_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    t = _fresh_table(spark, "q19_orders", sf_dir, orders)
    # matched-update source: every high-value order gets status 'R';
    # plus one synthetic 'N' order per distinct priority (keys < 0 never
    # collide with real o_orderkey)
    upd = orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey",
        F.lit("R").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderpriority",
    )
    from pyspark.sql import Window as W

    ins = (
        orders.select("o_orderpriority")
        .distinct()
        .select(
            (
                -(
                    F.lit(1)
                    + F.row_number().over(W.orderBy("o_orderpriority"))
                )
            )
            .cast("long")
            .alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
            "o_orderpriority",
        )
    )
    dml.merge(
        t,
        upd.unionByName(ins),
        on=["o_orderkey"],
        when_matched_update={
            "o_orderstatus": F.col("source.o_orderstatus"),
        },
        when_not_matched_insert=True,
    )
    return (
        t.scan()
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("order_count"),
            _dsum("o_totalprice").alias("total_revenue"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# q20 — DELETE invalid rows + UPDATE recode, then group counts. (D4/D5)
# --------------------------------------------------------------------------
@register(
    "q20_delete_update",
    oracle="""
    WITH after_dml AS (
      SELECT CASE WHEN l_returnflag = 'R' THEN 'X' ELSE l_returnflag END
               AS l_returnflag,
             l_quantity
      FROM lineitem
      WHERE NOT (l_quantity >= 49)
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS item_count,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_quantity
    FROM after_dml
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q20_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    t = _fresh_table(
        spark, "q20_lineitem", sf_dir, li, partition_by=["l_returnflag"]
    )
    # DELETE ... WHERE l_quantity >= 49 (purge, D5)
    dml.delete(t, F.col("l_quantity") >= 49)
    # UPDATE ... SET recode 'R' → 'X' (recode, D4). Partitioned by
    # l_returnflag, so the rewrite touches only that partition's files.
    dml.update(
        t, {"l_returnflag": F.lit("X")}, F.col("l_returnflag") == "R"
    )
    return (
        t.scan()
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("item_count"),
            _dsum("l_quantity").alias("total_quantity"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q21 — time travel: snapshot count BEFORE the second append vs current
# count (S5: FOR SYSTEM_TIME AS OF → scan(version=...)).
# --------------------------------------------------------------------------
@register(
    "q21_time_travel",
    oracle="""
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-01-01') AS count_v1,
      (SELECT CAST(count(*) AS BIGINT) FROM orders) AS count_current,
      CAST(3 AS BIGINT) AS snapshot_count
    """,
)
def q21_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    split = F.lit("1997-01-01").cast("timestamp")
    t = _fresh_table(
        spark, "q21_orders", sf_dir, orders.filter(F.col("o_orderdate") < split)
    )
    v1 = t.current_version()
    t.append(orders.filter(F.col("o_orderdate") >= split))
    count_v1 = t.scan(version=v1).count()
    count_current = t.scan().count()
    n_snapshots = len(t.snapshots())
    return spark.createDataFrame(
        [(count_v1, count_current, n_snapshots)],
        "count_v1 long, count_current long, snapshot_count long",
    )
