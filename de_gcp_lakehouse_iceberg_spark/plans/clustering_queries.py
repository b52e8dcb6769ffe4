"""q58 — distributed k-means over the embeddings table, hash-checked
end-to-end: the DuckDB oracle unrolls the SAME Lloyd iterations
(quantized integer vectors, sequential-fold double distances,
order-independent integer component sums) so assignments, cluster
sizes, and distances agree bit-for-bit. See operators/clustering.py for
the determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import kmeans
from ..operators.similarity import QUANT
from ..tables import table
from .queries import _r, register

_K = 8
_ITERS = 2

_DIST = """list_sum(list_transform(list_zip({q}, {c}),
    p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])))"""


def _kmeans_sql(
    k: int, iters: int, quant: int, k_sql: str | None = None
) -> str:
    """Unrolled-iteration CTE chain mirroring operators.clustering.kmeans.
    `k_sql` (a scalar-subquery expression, e.g. `(SELECT k FROM kk)`)
    replaces the literal seed count — the auto-k deployment shape
    (q70) derives k from the corpus size inside the oracle itself."""
    k_expr = k_sql or str(k)
    parts = [
        f"""q0 AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT))
               AS q
      FROM embeddings),
    c0 AS (
      SELECT cid, c FROM (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
                 AS cid,
               list_transform(q, x -> CAST(x AS DOUBLE)) AS c
        FROM q0)
      WHERE cid < {k_expr})"""
    ]
    for t in range(1, iters + 1):
        dist = _DIST.format(q="v.q", c=f"c{t-1}.c")
        parts.append(
            f"""s{t} AS (
      SELECT v.vec_id, v.q, c{t-1}.cid, {dist} AS dist
      FROM q0 v CROSS JOIN c{t-1}),
    a{t} AS (
      SELECT vec_id, q, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist ASC, cid ASC) AS rn
        FROM s{t}) WHERE rn = 1),
    m{t} AS (
      SELECT cid, pos,
             CAST(sum(comp) AS DOUBLE) / count(*) AS mean_comp
      FROM (
        SELECT cid, unnest(range(1, len(q) + 1)) AS pos,
               unnest(q) AS comp
        FROM a{t})
      GROUP BY cid, pos),
    u{t} AS (
      SELECT cid, list(mean_comp ORDER BY pos) AS c FROM m{t} GROUP BY cid),
    c{t} AS (
      SELECT old.cid, coalesce(new.c, old.c) AS c
      FROM c{t-1} old LEFT JOIN u{t} new USING (cid))"""
        )
    dist = _DIST.format(q="v.q", c=f"c{iters}.c")
    parts.append(
        f"""sf AS (
      SELECT v.vec_id, v.label, c{iters}.cid, {dist} AS dist
      FROM q0 v CROSS JOIN c{iters}),
    af AS (
      SELECT vec_id, label, cid, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist ASC, cid ASC) AS rn
        FROM sf) WHERE rn = 1)"""
    )
    return ",\n    ".join(parts)


@register(
    "q58_kmeans",
    oracle=f"""
    WITH {_kmeans_sql(_K, _ITERS, QUANT)}
    SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_vectors,
           floor(CAST(sum(label) AS DOUBLE) / count(*) * 1000000 + 0.5)
             / 1000000 AS avg_label,
           floor(max(dist) / {QUANT} / {QUANT} * 1000000 + 0.5) / 1000000
             AS max_dist
    FROM af
    GROUP BY cid
    ORDER BY cid
    """,
)
def q58_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    assigned = kmeans(emb, k=_K, iters=_ITERS)
    labeled = assigned.join(emb.select("vec_id", "label"), "vec_id")
    return (
        labeled.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_vectors"),
            _r(F.sum("label").cast("double") / F.count("*"), 6).alias(
                "avg_label"
            ),
            # de-quantize the fixed-point distance back to input units
            _r(F.max("dist") / F.lit(QUANT) / F.lit(QUANT), 6).alias(
                "max_dist"
            ),
        )
        .orderBy("cluster_id")
    )
