"""q104 — JOIN-view incremental maintenance under the driver hash
gate: a revenue-by-market-segment rollup over `orders ⋈ customer`
(the reference's enriched zone-join view shape, README.md:548-557),
bootstrapped from lakehouse tables, then DML applied to BOTH sides —
DELETE + UPDATE + INSERT on the fact AND a dimension UPDATE that
re-segments customers — then ONE bilinear delta refresh
(lakehouse/ivm.JoinRollup: ΔF⋈D_new + F_old⋈ΔD; never re-joining
history). The oracle recomputes the rollup from both tables' FINAL
logical state, so the delta algebra, the dimension-driven group moves,
and the aggregates are all hash-gated.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable, dml
from ..lakehouse.ivm import JoinRollup
from ..tables import table
from .queries import register
from .workdir import scratch

_ROOT = scratch("lakehouse_ivm_join_query")
_DEL = "o_custkey % 7 = 3"
_UPD = "o_custkey % 5 = 1"
_INS = "o_custkey % 11 = 4"
_DUPD = "c_custkey % 3 = 1"  # dimension re-segmentation


@register(
    "q104_ivm_join_rollup",
    oracle=f"""
    WITH base_o AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
    base_c AS (
      SELECT c_custkey, c_mktsegment FROM customer),
    after_del AS (SELECT * FROM base_o WHERE NOT ({_DEL})),
    after_upd AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN {_UPD} THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS p
      FROM after_del),
    final_o AS (
      SELECT o_custkey, p FROM after_upd
      UNION ALL
      SELECT o_custkey, o_totalprice AS p FROM base_o WHERE {_INS}),
    final_c AS (
      SELECT c_custkey,
             CASE WHEN {_DUPD} THEN 'RECODED' ELSE c_mktsegment END
               AS c_mktsegment
      FROM base_c)
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(o.p AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           'delta' AS refresh_mode
    FROM final_o o JOIN final_c c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q104_ivm_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both sides expose the equi-key under ONE name (custkey) — the
    # join-rollup contract; every other column name is side-unique
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        "o_totalprice",
    )
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)
    fact = LakeTable.create(spark, os.path.join(root, "fact"))
    fact.append(orders.coalesce(4), operation="load")
    dim = LakeTable.create(spark, os.path.join(root, "dim"))
    dim.append(customer.coalesce(2), operation="load")
    ru = JoinRollup.create_join(
        spark,
        os.path.join(root, "rollup"),
        fact,
        dim,
        join_keys=["custkey"],
        group_cols=["c_mktsegment"],
        sum_cols=["o_totalprice"],
    )
    dml.delete(fact, _DEL.replace("o_custkey", "custkey"))
    dml.update(
        fact,
        {"o_totalprice": "o_totalprice + 10.0"},
        _UPD.replace("o_custkey", "custkey"),
    )
    fact.append(
        orders.filter(F.expr(_INS.replace("o_custkey", "custkey"))),
        operation="late_arrivals",
    )
    dml.update(
        dim,
        {"c_mktsegment": "'RECODED'"},
        _DUPD.replace("c_custkey", "custkey"),
    )
    res = ru.refresh()
    assert res["mode"] == "delta", res  # the whole point: no re-join
    return (
        ru.df()
        .select(
            "c_mktsegment",
            "cnt",
            F.col("sum_o_totalprice").cast("double").alias("revenue"),
            F.lit(res["mode"]).alias("refresh_mode"),
        )
        .orderBy("c_mktsegment")
    )
