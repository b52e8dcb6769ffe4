"""q98 — delta incremental view maintenance under the driver hash
gate: a COUNT/SUM rollup bootstrapped from a lakehouse base table,
then DELETE + UPDATE + INSERT applied to the base, then ONE
changelog-delta refresh (lakehouse/ivm.py — no base re-scan). The
oracle recomputes the rollup from the base's FINAL logical state AND
the expected changelog row count (1 DELETE per deleted row, a
DELETE+INSERT pair per updated row, 1 INSERT per appended row), so
both the aggregate values and the delta plumbing are hash-gated.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable, dml
from ..lakehouse.ivm import IncrementalRollup
from ..tables import table
from .queries import register
from .workdir import scratch

_ROOT = scratch("lakehouse_ivm_query")
_DEL = "o_custkey % 7 = 3"
_UPD = "o_custkey % 5 = 1"
_INS = "o_custkey % 11 = 4"


@register(
    "q98_ivm_delta_rollup",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
      FROM orders),
    after_del AS (SELECT * FROM base WHERE NOT ({_DEL})),
    after_upd AS (
      SELECT o_orderkey, o_custkey, o_orderpriority,
             CASE WHEN {_UPD} THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS p
      FROM after_del),
    final AS (
      SELECT o_orderpriority, p FROM after_upd
      UNION ALL
      SELECT o_orderpriority, o_totalprice AS p
      FROM base WHERE {_INS}),
    meta AS (
      SELECT CAST(
        (SELECT count(*) FROM base WHERE {_DEL})
        + 2 * (SELECT count(*) FROM base WHERE ({_UPD})
               AND NOT ({_DEL}))
        + (SELECT count(*) FROM base WHERE {_INS}) AS BIGINT)
        AS delta_rows)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(p AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           'delta' AS refresh_mode,
           meta.delta_rows
    FROM final, meta
    GROUP BY o_orderpriority, meta.delta_rows
    ORDER BY o_orderpriority
    """,
)
def q98_ivm_delta_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)
    base = LakeTable.create(spark, os.path.join(root, "base"))
    # a handful of right-sized files, not one per shuffle partition:
    # every DML pass below plans/rewrites per file
    base.append(orders.coalesce(4), operation="load")
    rollup = IncrementalRollup.create(
        spark,
        os.path.join(root, "rollup"),
        base,
        group_cols=["o_orderpriority"],
        sum_cols=["o_totalprice"],
    )
    dml.delete(base, _DEL)
    dml.update(base, {"o_totalprice": "o_totalprice + 10.0"}, _UPD)
    base.append(
        orders.filter(F.expr(_INS)), operation="late_arrivals"
    )
    res = rollup.refresh()
    assert res["mode"] == "delta", res  # the whole point: no rescan
    return (
        rollup.df()
        .select(
            "o_orderpriority",
            "cnt",
            F.col("sum_o_totalprice").cast("double").alias("revenue"),
            F.lit(res["mode"]).alias("refresh_mode"),
            F.lit(res["delta_rows"]).alias("delta_rows"),
        )
        .orderBy("o_orderpriority")
    )
