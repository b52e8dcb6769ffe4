"""Similarity-search query corpus over the `embeddings` table
(SURVEY.md §7.1 step 10).

The cosine oracle mirrors the Spark operation order exactly (sequential
fold dot/norm, then dot/(na·nb)) — bit-identical doubles, so rank and
top-k sets agree. The LSH entry is rows-only (plane literals are
engine-internal); tests/test_similarity.py pins its recall against the
brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    lsh_ann_topk,
    nearest_pairs_blocked,
)
from ..tables import table
from .queries import _r, register

_COS_SQL = """
    n AS (
      SELECT vec_id, label, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings)
"""


def _cos_expr(a: str, b: str) -> str:
    return f"""list_sum(list_transform(list_zip({a}.embedding, {b}.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / ({a}.nrm * {b}.nrm)"""


# --------------------------------------------------------------------------
# q38 — exact brute-force cosine top-k for a fixed query set (the ANN
# baseline): queries are vec_id < 5, k = 10.
# --------------------------------------------------------------------------
@register(
    "q38_cosine_topk",
    oracle=f"""
    WITH {_COS_SQL},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_cos_expr('q', 'c')} AS cos
      FROM n q JOIN n c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored)
    SELECT query_id, neighbor_id,
           floor(cos * 1000000 + 0.5) / 1000000 AS cosine, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def q38_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    return out.select(
        "query_id", "neighbor_id", _r(F.col("cosine"), 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# q39 — embedding near-dup: label-blocked all-pairs, global top-20 most
# similar (blocking keeps the pair count linear-ish in corpus size).
# --------------------------------------------------------------------------
@register(
    "q39_nearest_pairs",
    oracle=f"""
    WITH {_COS_SQL},
    pairs AS (
      SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
             {_cos_expr('a', 'b')} AS cos
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT CAST(label AS INTEGER) AS label, id_a, id_b,
           floor(cos * 1000000 + 0.5) / 1000000 AS cosine
    FROM pairs
    ORDER BY cos DESC, id_a, id_b
    LIMIT 20
    """,
)
def q39_nearest_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    out = nearest_pairs_blocked(emb, block_col="label", top_n=20)
    return out.select(
        "label", "id_a", "id_b", _r(F.col("cosine"), 6).alias("cosine")
    )


# --------------------------------------------------------------------------
# q40 — LSH-bucketed approximate top-k (the scale path). Rows-only check;
# recall vs q38 is pinned in tests/test_similarity.py.
# --------------------------------------------------------------------------
@register("q40_lsh_ann")
def q40_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]  # don't assume 64
    out = lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, dim=dim)
    return out.select(
        "query_id", "neighbor_id", _r(F.col("cosine"), 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# q45 — IVF (inverted-file) ANN, the second scale path. Rows-only;
# recall + exact-score invariants pinned in tests/test_similarity.py.
# --------------------------------------------------------------------------
@register("q45_ivf_ann")
def q45_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_ann_topk

    emb = table(spark, sf_dir, "embeddings")
    out = ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_centroids=32, nprobe=8
    )
    return out.select(
        "query_id", "neighbor_id", _r(F.col("cosine"), 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")
