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
# q40 — LSH-bucketed approximate top-k (the scale path). FULL oracle:
# bucket keys come from INTEGER projections of fixed-point-quantized
# embeddings onto integer hyperplanes (operators/similarity.py QUANT) —
# integer dot products are exact and order-independent, so the numpy
# matmul in the Spark UDF and the list_sum folds below produce the SAME
# sign bits, hence the same candidate sets; exact cosine scoring then
# matches bit-for-bit like q38. Plane literals are generated from the
# same `hyperplanes()` call the operator uses. The oracle pins dim=64
# (the testdata embedding width at every SF); the Spark side still
# infers dim at runtime.
# --------------------------------------------------------------------------
def _lsh_ann_sql(
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 8,
    seed: int = 7,
    k: int = 10,
) -> str:
    from ..operators.similarity import QUANT, hyperplanes

    tables = [hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)]

    def proj(t: int, h: int) -> str:
        lit = "[" + ",".join(str(int(v)) for v in tables[t][h]) + "]"
        return f"list_sum(list_transform(list_zip(q, {lit}), p -> p[1]*p[2]))"

    def bucket(t: int) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN {proj(t, h)} > 0 THEN {1 << h} ELSE 0 END)"
            for h in range(num_planes)
        ) + ")"

    table_ids = ", ".join(str(t) for t in range(num_tables))
    buckets = ",\n             ".join(bucket(t) for t in range(num_tables))
    probe_list = "[b" + "".join(
        f", xor(b, {1 << h})" for h in range(num_planes)
    ) + "]"
    return f"""
    qv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS q
      FROM embeddings),
    cb AS (
      SELECT vec_id,
             unnest([{table_ids}]) AS t,
             unnest([{buckets}]) AS b
      FROM qv),
    probes AS (
      SELECT vec_id AS query_id, t, unnest({probe_list}) AS pb
      FROM cb WHERE vec_id < 5),
    cand AS (
      SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
      FROM probes p JOIN cb c ON c.t = p.t AND c.b = p.pb
      WHERE c.vec_id <> p.query_id)
    """


@register(
    "q40_lsh_ann",
    oracle=f"""
    WITH {_COS_SQL},
    {_lsh_ann_sql()},
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, {_cos_expr('qn', 'cn')} AS cos
      FROM cand
      JOIN n qn ON qn.vec_id = cand.query_id
      JOIN n cn ON cn.vec_id = cand.neighbor_id),
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
def q40_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding")).first()[0]  # don't assume 64
    out = lsh_ann_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, dim=dim)
    return out.select(
        "query_id", "neighbor_id", _r(F.col("cosine"), 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# q45 — IVF (inverted-file) ANN, the second scale path. FULL oracle: the
# strided centroid sample, its driver-side sequential-fold normalization,
# and the integer assignment scores are all replayed in SQL — the
# operator normalizes centroids with the exact operation order DuckDB's
# list_sum uses, then quantizes, so probe order and inverted lists agree
# exactly; cosine scoring matches like q38.
# --------------------------------------------------------------------------
def _ivf_sql(n_centroids: int = 32, nprobe: int = 8) -> str:
    from ..operators.similarity import QUANT

    return f"""
    qv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS q
      FROM embeddings),
    cent0 AS (
      SELECT vec_id, embedding
      FROM embeddings
      WHERE vec_id % greatest(1, (SELECT count(*) FROM embeddings) // {n_centroids}) = 0
      ORDER BY vec_id LIMIT {n_centroids}),
    cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE)
                    / sqrt(list_sum(list_transform(embedding,
                          y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
                    * {QUANT} + 0.5) AS BIGINT)) AS qc
      FROM cent0),
    assign AS (
      SELECT e.vec_id, c.cid,
             list_sum(list_transform(list_zip(e.q, c.qc), p -> p[1]*p[2])) AS s
      FROM qv e, cents c),
    rn AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rnk
      FROM assign),
    lists AS (SELECT vec_id AS neighbor_id, cid FROM rn WHERE rnk = 1),
    probes AS (
      SELECT vec_id AS query_id, cid
      FROM rn WHERE rnk <= {nprobe} AND vec_id < 5),
    cand AS (
      SELECT DISTINCT p.query_id, l.neighbor_id
      FROM probes p JOIN lists l ON l.cid = p.cid
      WHERE l.neighbor_id <> p.query_id)
    """


@register(
    "q45_ivf_ann",
    oracle=f"""
    WITH {_COS_SQL},
    {_ivf_sql()},
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, {_cos_expr('qn', 'cn')} AS cos
      FROM cand
      JOIN n qn ON qn.vec_id = cand.query_id
      JOIN n cn ON cn.vec_id = cand.neighbor_id),
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
def q45_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_ann_topk

    emb = table(spark, sf_dir, "embeddings")
    out = ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, n_centroids=32, nprobe=8
    )
    return out.select(
        "query_id", "neighbor_id", _r(F.col("cosine"), 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# q96 — SQ8 (int8 scalar-quantized) ANN with exact re-rank: the
# memory-compressed scale path (codes 4x smaller than float32, integer
# candidate metric, float cosine only for the top-`rerank`). FULL
# oracle: the per-dim codebook, the quantization expression, the
# integer distance, the rerank boundary, and the final cosine are all
# replayed in SQL — identical IEEE op order, so ranks match exactly.
# --------------------------------------------------------------------------
_SQ8_RERANK = 30


@register(
    "q96_sq8_ann",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, i.i AS d, CAST(embedding[i.i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS i(i)),
    dims AS (
      SELECT d, min(x) AS mn, max(x) AS mx FROM ex GROUP BY d),
    codes AS (
      SELECT vec_id, ex.d,
             CAST(CASE WHEN mx = mn THEN 0
                  ELSE least(255, greatest(0,
                       floor((x - mn) * 255 / (mx - mn) + 0.5)))
             END AS BIGINT) AS c
      FROM ex JOIN dims ON ex.d = dims.d),
    dist AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(sum((q.c - c.c) * (q.c - c.c)) AS BIGINT) AS d2
      FROM codes q JOIN codes c
        ON q.vec_id < 5 AND c.vec_id <> q.vec_id AND q.d = c.d
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d2, neighbor_id) AS rr
        FROM dist) WHERE rr <= {_SQ8_RERANK}),
    {_COS_SQL},
    rer AS (
      SELECT cand.query_id, cand.neighbor_id,
             {_cos_expr('q', 'c')} AS cos
      FROM cand
      JOIN n q ON q.vec_id = cand.query_id
      JOIN n c ON c.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
      FROM rer)
    SELECT query_id, neighbor_id,
           floor(cos * 1000000 + 0.5) / 1000000 AS cosine, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def q96_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import sq8_topk
    from ..tables import table_rows

    # SQ8's per-row work (one 64-dim code UDF + integer distance) is
    # far lighter than the text pipelines the spread guard was built
    # for, so its fan-out crossover sits higher: measured no-spread
    # wins at 2k rows (1.76 vs 2.91 s), spread wins at 20k (2.52 vs
    # 3.24 s) and 60k (3.09 vs 5.22 s). Route by the measured footer
    # cardinality — below the floor the exchange's fixed stage cost
    # exceeds the starved splits' entire workload. At 100 TB rows >>
    # floor AND splits >= cores, so this floor never bites there (the
    # split-count guard already no-ops the spread).
    from ..tables import SPREAD_MIN_ROWS

    n = table_rows(spark, sf_dir, "embeddings")
    emb = table(spark, sf_dir, "embeddings", heavy=(n >= SPREAD_MIN_ROWS))
    out = sq8_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, rerank=_SQ8_RERANK
    )
    return out.select(
        "query_id", "neighbor_id", _r(F.col("cosine"), 6).alias("cosine"),
        "rank",
    ).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# q100 — per-label centroid rollup (operators/similarity.centroid_rollup):
# the vector-mean maintenance pass behind IVF retraining / SemDeDup
# cluster upkeep. Exact decimal per-dim means (order-independent),
# 6dp-quantized; the gate checks the full centroid through exact
# decimal checksums plus spot dimensions.
# --------------------------------------------------------------------------
@register(
    "q100_centroid_rollup",
    oracle="""
    WITH ex AS (
      SELECT label, i.i - 1 AS d, CAST(embedding[i.i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS i(i)),
    per_dim AS (
      SELECT label, d, CAST(count(*) AS BIGINT) AS n,
             floor(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                   / count(*) * 1000000 + 0.5) / 1000000 AS m
      FROM ex GROUP BY label, d)
    SELECT label,
           CAST(max(n) AS BIGINT) AS n_vectors,
           CAST(sum(CAST(m AS DECIMAL(28,6))) AS DOUBLE) AS centroid_sum,
           min(m) AS centroid_min,
           max(m) AS centroid_max,
           min(CASE WHEN d = 0 THEN m END) AS dim0,
           min(CASE WHEN d = 63 THEN m END) AS dim63
    FROM per_dim
    GROUP BY label
    ORDER BY label
    """,
)
def q100_centroid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import centroid_rollup

    emb = table(spark, sf_dir, "embeddings")
    c = centroid_rollup(emb, "label", "embedding", scale=6)
    return c.select(
        "label",
        "n_vectors",
        F.aggregate(
            F.transform(F.col("centroid"), lambda m: m.cast("decimal(28,6)")),
            F.lit(0).cast("decimal(28,6)"),
            lambda acc, x: (acc + x).cast("decimal(28,6)"),
        )
        .cast("double")
        .alias("centroid_sum"),
        F.array_min("centroid").alias("centroid_min"),
        F.array_max("centroid").alias("centroid_max"),
        F.col("centroid")[0].alias("dim0"),
        F.col("centroid")[63].alias("dim63"),
    ).orderBy("label")
