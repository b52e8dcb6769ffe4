"""q102 — COUNT(DISTINCT)-class incremental view maintenance under the
driver hash gate: a rollup with a KMV-sketch distinct column
(lakehouse/ivm.py distinct_cols) bootstrapped from a lakehouse base,
then DELETE + UPDATE-of-the-distinct-column + INSERT applied, then ONE
changelog-delta refresh. The refresh merges insert sketches (pure
array math) and targeted-recomputes only groups where a deleted
value's hash could occupy a sketch slot — never a full base re-scan.

The oracle replays the IDENTICAL integer KMV estimator over the base's
final logical state (portable affine hash → k smallest distinct hashes
→ exact count below k, (k−1)·P/h_k above), so the maintained sketch is
hash-gated against a from-scratch recompute. Reference analog: the
daily_zone_stats view's COUNT(DISTINCT payment_type)
(sql/create_iceberg_tables.sql:180) kept fresh without re-aggregating
history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable, dml
from ..lakehouse.ivm import IncrementalRollup
from ..operators.sampling import SAMPLE_P, id_hash_sql
from ..tables import table
from .queries import register
from .workdir import scratch

_ROOT = scratch("lakehouse_ivm_distinct_query")
_K = 64
_DEL = "o_custkey % 7 = 3"
_UPD = "o_custkey % 5 = 1"
_INS = "o_custkey % 11 = 4"


@register(
    "q102_ivm_distinct_kmv",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderpriority FROM orders),
    after_del AS (SELECT * FROM base WHERE NOT ({_DEL})),
    after_upd AS (
      SELECT o_orderpriority,
             CASE WHEN {_UPD} THEN o_custkey + 1000000
                  ELSE o_custkey END AS c
      FROM after_del),
    final AS (
      SELECT o_orderpriority, c FROM after_upd
      UNION ALL
      SELECT o_orderpriority, o_custkey AS c FROM base WHERE {_INS}),
    hashed AS (
      SELECT DISTINCT o_orderpriority AS g,
             {id_hash_sql("c")} AS h
      FROM final),
    ranked AS (
      SELECT g, h,
             row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM hashed),
    sk AS (
      SELECT g, count(*) AS n, max(h) AS kth
      FROM ranked WHERE rn <= {_K} GROUP BY g),
    est AS (
      SELECT g,
             CASE WHEN n < {_K} THEN n
                  ELSE CAST(floor(CAST({(_K - 1) * SAMPLE_P} AS DOUBLE)
                                  / kth) AS BIGINT)
             END AS distinct_cust
      FROM sk),
    cnts AS (
      SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS cnt
      FROM final GROUP BY o_orderpriority)
    SELECT cnts.g AS o_orderpriority, cnts.cnt, est.distinct_cust,
           'delta' AS refresh_mode
    FROM cnts JOIN est ON cnts.g = est.g
    ORDER BY o_orderpriority
    """,
)
def q102_ivm_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)
    base = LakeTable.create(spark, os.path.join(root, "base"))
    base.append(orders.coalesce(4), operation="load")
    rollup = IncrementalRollup.create(
        spark,
        os.path.join(root, "rollup"),
        base,
        group_cols=["o_orderpriority"],
        sum_cols=[],
        distinct_cols=["o_custkey"],
        kmv_k=_K,
    )
    dml.delete(base, _DEL)
    # rewriting the DISTINCT column exercises both maintenance paths in
    # one window: the UPDATE's DELETE half can evict sketch slots
    # (targeted recompute) while its INSERT half merges new hashes
    dml.update(base, {"o_custkey": "o_custkey + 1000000"}, _UPD)
    base.append(orders.filter(F.expr(_INS)), operation="late_arrivals")
    res = rollup.refresh()
    assert res["mode"] == "delta", res  # the whole point: no rescan
    return (
        rollup.df()
        .select(
            "o_orderpriority",
            "cnt",
            F.col("distinct_o_custkey").alias("distinct_cust"),
            F.lit(res["mode"]).alias("refresh_mode"),
        )
        .orderBy("o_orderpriority")
    )
