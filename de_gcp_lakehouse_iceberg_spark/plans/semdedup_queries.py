"""q70 — SemDeDup-style clustered embedding near-dedup, hash-checked
end-to-end (operators/clustering.semdedup; Abbas et al. 2023).

Oracle: reuses the q58 assignment CTE machinery with ZERO Lloyd
iterations (pure nearest-seed-centroid assignment — quantized integer
vectors, sequential-fold double distances, ties to the lowest cid),
then replays the within-cluster pair stage with the same sequential
cosine fold the q38/q39 oracles pin. The keep-the-lowest-id rule is
order-independent, so both engines agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import semdedup
from ..operators.similarity import QUANT
from ..tables import table
from .clustering_queries import _kmeans_sql
from .queries import register

_K = 8
_TAU = 0.35

_COS = """list_sum(list_transform(list_zip(a.embedding, b.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (a.nrm * b.nrm)"""


@register(
    "q70_semdedup",
    oracle=f"""
    WITH {_kmeans_sql(_K, 0, QUANT)},
    n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    m AS (
      SELECT af.vec_id, af.cid, n.embedding, n.nrm
      FROM af JOIN n USING (vec_id)),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM m a JOIN m b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_COS} >= {_TAU})
    SELECT m.cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(d.vec_id) AS BIGINT) AS n_dups,
           CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept
    FROM m LEFT JOIN dups d ON m.vec_id = d.vec_id
    GROUP BY cluster_id
    ORDER BY cluster_id
    """,
)
def q70_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    flagged = semdedup(emb, k=_K, tau=_TAU)
    return (
        flagged.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
            (F.count("*") - F.sum(F.col("is_dup").cast("long"))).alias(
                "n_kept"
            ),
        )
        .orderBy("cluster_id")
    )
