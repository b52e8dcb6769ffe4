"""q71 — deterministic shuffle-shard export proof. The per-shard
order checksum Σ pos·doc_id is position-sensitive (any reordering or
misassignment changes it) and exactly representable in int64, so the
hash gate pins the SHUFFLE ORDER itself, not just shard membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import id_hash_sql
from ..operators.sharding import shuffle_shard
from ..tables import table
from .queries import register

_N_SHARDS = 8


@register(
    "q71_shuffle_shard",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {id_hash_sql('doc_id')} AS hh
      FROM documents),
    o AS (
      SELECT doc_id, hh % {_N_SHARDS} AS shard,
             row_number() OVER (PARTITION BY hh % {_N_SHARDS}
                                ORDER BY hh, doc_id) AS pos
      FROM s)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc,
           CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
    FROM o
    GROUP BY shard
    ORDER BY shard
    """,
)
def q71_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_corpus=False: the operator's contract IS the single
    # exchange (test_shuffle_shard_single_exchange_plan)
    docs = table(spark, sf_dir, "documents", spread_corpus=False).select(
        "doc_id"
    )
    sharded = shuffle_shard(docs, _N_SHARDS)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum"),
        )
        .orderBy("shard")
    )
