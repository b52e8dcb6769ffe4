"""q84/q85 — scale-pattern operators whose RESULTS are exactly the
classic formulation, hash-gated against it.

q84 — Bloom semi-join: lineitem revenue for parts of one size class.
The big probe side is pre-filtered by a broadcast Bloom filter of the
small side's keys (operators/bloomjoin.py) before the exact semi-join;
no false negatives ⇒ the oracle is the PLAIN `IN` subquery. At 100 TB
the bloom drops non-matching lineitem rows at the scan instead of
shuffling them.

q85 — two-phase grouped top-k: top-3 orders by price per order
priority (tie-break orderkey). operators/topk.py keeps partial top-k
per input partition and merges — bounded state, no per-group global
sort; the oracle is the textbook row_number window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloomjoin import bloom_semi_join
from ..operators.topk import grouped_topk
from ..tables import table
from .queries import _r, _dsum, register

_SIZE = 1
_K = 3


@register(
    "q84_bloom_semi_join",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE)
                 * 100 + 0.5) / 100 AS revenue
    FROM lineitem
    WHERE l_partkey IN
          (SELECT p_partkey FROM part WHERE p_size = {_SIZE})
    """,
)
def q84_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "partkey"
    )
    small = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") == _SIZE)
        .select(F.col("p_partkey").alias("partkey"))
    )
    hits = bloom_semi_join(big, small, "partkey")
    return hits.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.countDistinct("partkey").alias("n_parts"),
        _r(
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                scale=6,
            ),
            2,
        ).alias("revenue"),
    )


@register(
    "q85_grouped_topk",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
             o_orderkey, o_totalprice
      FROM orders)
    SELECT o_orderpriority, rank, o_orderkey, o_totalprice
    FROM ranked WHERE rank <= {_K}
    ORDER BY o_orderpriority, rank
    """,
)
def q85_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    top = grouped_topk(
        orders,
        ["o_orderpriority"],
        # ascending lexicographic key: (-price, orderkey) == price DESC
        # with orderkey tie-break
        [(-F.col("o_totalprice")), F.col("o_orderkey")],
        k=_K,
    )
    return top.select(
        "o_orderpriority",
        F.col("rank").cast("long").alias("rank"),
        "o_orderkey",
        "o_totalprice",
    ).orderBy("o_orderpriority", "rank")
