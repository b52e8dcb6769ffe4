"""q70 — SemDeDup-style clustered embedding near-dedup, hash-checked
end-to-end (operators/clustering.semdedup; Abbas et al. 2023).

Gated at the AUTO-K deployment shape (r10 VERDICT #4): k is derived
from the corpus size inside BOTH engines (max(8, ceil(N/250)) — the
`kk` CTE below / `semdedup(k=None)`), so clusters stay ~250 vectors
and the gate's pair work scales ~N·250 instead of the fixed-k N²/8
that cost 92 s at sf3. At the driver's gate SFs the formula evaluates
to k=8, i.e. the historical fixed-k rows remain byte-identical. The
fixed-k form stays a pytest-only baseline (tests/test_clustering.py).

Oracle: reuses the q58 assignment CTE machinery with ZERO Lloyd
iterations (pure nearest-seed-centroid assignment — quantized integer
vectors, sequential-fold double distances, ties to the lowest cid),
then replays the within-cluster pair stage with the same sequential
cosine fold the q38/q39 oracles pin. The keep-the-lowest-id rule is
order-independent, so both engines agree row-for-row; the Arrow
matmul assignment used by k=None accumulates dimension-sequentially,
bit-identical to the fold (pinned in tests/test_clustering.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import semdedup
from ..operators.similarity import QUANT
from ..tables import table
from .clustering_queries import _kmeans_sql
from .queries import register

_TAU = 0.35
# auto-k (the k∝N DEPLOYMENT route, clustering.semdedup k=None):
# k = max(8, ceil(N/250)) keeps clusters ~250 vectors so pair work is
# ~N·250 instead of N²/k — at the gate SFs (N < 2000) this evaluates
# to 8, i.e. exactly the old fixed-k oracle; at sf3 it caps the gate
# shape that cost 92 s (77% of the B2 ceiling, r10 VERDICT #4). Pure
# integer math, engine-portable.
_K_SQL = (
    "kk AS (SELECT greatest(8, (count(*) + 249) // 250) AS k "
    "FROM embeddings)"
)

_COS = """list_sum(list_transform(list_zip(a.embedding, b.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (a.nrm * b.nrm)"""


@register(
    "q70_semdedup",
    oracle=f"""
    WITH {_K_SQL},
    {_kmeans_sql(0, 0, QUANT, k_sql="(SELECT k FROM kk)")},
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
    flagged = semdedup(emb, k=None, tau=_TAU)
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
