"""q94/q95 — corpus-selection tuning operators, hash-gated.

q94 — per-source document cap (the RefinedWeb/Gopher "domain cap":
no single domain may dominate the training mix). Keep the top-K docs
per source by (quality DESC, doc_id) using the two-phase
`grouped_topk` — bounded k×partitions state per group, no row_number
window hot task (the q85 scale argument, applied to curation).

q95 — quality-threshold selection curve: docs/tokens retained at each
candidate threshold, computed in ONE corpus pass as paired conditional
aggregates (the scale-right form — a per-threshold explode would scan
the corpus once per candidate). This is the tuning table a curation
run consults before committing to a filter threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from ..operators.topk import grouped_topk
from ..tables import table
from .dedup_queries import _SHINGLE_SQL
from .queries import register
from .text_queries import _QUALITY_SQL_EXPR

_CAP = 15
_THRESHOLDS = [0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90]


@register(
    "q94_source_doc_cap",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, {_QUALITY_SQL_EXPR} AS score FROM documents),
    ranked AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rnk
      FROM scored),
    kept AS (SELECT * FROM ranked WHERE rnk <= {_CAP})
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(rnk) AS BIGINT) AS rank_checksum,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           floor(CAST(sum(CAST(score AS DECIMAL(24,12))) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS kept_quality
    FROM kept
    GROUP BY source
    ORDER BY source
    """,
)
def q94_source_doc_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score("text").alias("score")
    )
    # ascending struct sort ⇒ negate the score for DESC; doc_id breaks
    # ties so the kept set is the window form's rows exactly
    kept = grouped_topk(
        scored.withColumn("_negq", -F.col("score")),
        ["source"],
        [F.col("_negq"), F.col("doc_id")],
        _CAP,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("rank").alias("rank_checksum"),
            F.sum("doc_id").alias("id_checksum"),
            (
                F.floor(
                    F.sum(F.col("score").cast("decimal(24,12)")).cast(
                        "double"
                    )
                    * 10_000
                    + F.lit(0.5)
                )
                / 10_000
            ).alias("kept_quality"),
        )
        .orderBy("source")
    )


@register(
    "q95_quality_threshold_sweep",
    oracle=f"""
    WITH s AS (
      SELECT {_QUALITY_SQL_EXPR} AS score,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents),
    th(threshold) AS (VALUES {", ".join(f"({t})" for t in _THRESHOLDS)})
    SELECT th.threshold,
           CAST(count(*) FILTER (WHERE s.score >= th.threshold)
                AS BIGINT) AS docs_kept,
           CAST(coalesce(sum(n) FILTER (WHERE s.score >= th.threshold), 0)
                AS BIGINT) AS tokens_kept
    FROM th, s
    GROUP BY th.threshold
    ORDER BY th.threshold
    """,
)
def q95_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        quality_score("text").alias("score"),
        token_count("text").cast("long").alias("n"),
    )
    aggs = []
    for i, t in enumerate(_THRESHOLDS):
        keep = F.col("score") >= F.lit(t)
        aggs.append(F.count_if(keep).alias(f"d{i}"))
        aggs.append(
            F.coalesce(F.sum(F.when(keep, F.col("n"))), F.lit(0)).alias(
                f"t{i}"
            )
        )
    row = s.agg(*aggs).first()
    return spark.createDataFrame(
        [
            (t, int(row[f"d{i}"]), int(row[f"t{i}"]))
            for i, t in enumerate(_THRESHOLDS)
        ],
        "threshold double, docs_kept long, tokens_kept long",
    )


# --------------------------------------------------------------------------
# q97 — canonical-document selection: the FINAL dedup decision. Near-dup
# pairs (exact n-gram Jaccard) → connected components (alternating
# large-star/small-star) → keep the best-quality doc per cluster
# (tie: lowest doc_id). This composes q35 + q53 + the quality scorer
# into the operator a corpus build actually runs: "of these N mutually
# duplicate docs, which ONE survives".
# --------------------------------------------------------------------------
@register(
    "q97_canonical_selection",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    jpairs AS (
      SELECT p.doc_a, p.doc_b
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS common
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b) p
      JOIN sizes sa ON p.doc_a = sa.doc_id
      JOIN sizes sb ON p.doc_b = sb.doc_id
      WHERE CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common) >= 0.5),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM jpairs
      UNION
      SELECT doc_b, doc_a FROM jpairs),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
    labels AS (
      SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      FROM reach GROUP BY src),
    scored AS (
      SELECT d.doc_id, d.lang, {_QUALITY_SQL_EXPR} AS q
      FROM documents d JOIN labels l ON d.doc_id = l.doc_id),
    ranked AS (
      SELECT s.doc_id, s.lang, s.q, l.cluster_id,
             row_number() OVER (PARTITION BY l.cluster_id
                                ORDER BY s.q DESC, s.doc_id) AS rnk
      FROM scored s JOIN labels l ON s.doc_id = l.doc_id)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS clustered_docs,
           CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN rnk = 1 THEN doc_id END) AS BIGINT)
             AS kept_id_sum,
           CAST(sum(CASE WHEN rnk > 1 THEN doc_id END) AS BIGINT)
             AS dropped_id_sum,
           floor(CAST(sum(CASE WHEN rnk = 1
                          THEN CAST(q AS DECIMAL(24,12)) END) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS kept_quality
    FROM ranked
    GROUP BY lang
    ORDER BY lang
    """,
)
def q97_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dup_clusters_star, near_dup_pairs

    docs = table(spark, sf_dir, "documents")
    # route-selected pair source (exact at gate scale, LSH past the
    # fan-out threshold — same pair set either way, see near_dup_pairs)
    pairs = near_dup_pairs(docs, threshold=0.5)
    clusters = dup_clusters_star(pairs).localCheckpoint()
    scored = docs.select(
        "doc_id", "lang", quality_score("text").alias("q")
    ).join(clusters, "doc_id")
    # rank WITHIN each dup cluster (window partitions are cluster-sized
    # — tiny and naturally bounded, unlike a full-corpus window; the
    # rollup needs every row ranked, so two-phase top-k doesn't apply)
    from pyspark.sql import Window as W

    w = W.partitionBy("cluster_id").orderBy(
        F.desc("q"), F.asc("doc_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").alias("clustered_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum(F.when(F.col("rank") == 1, F.col("doc_id"))).alias(
                "kept_id_sum"
            ),
            F.sum(F.when(F.col("rank") > 1, F.col("doc_id"))).alias(
                "dropped_id_sum"
            ),
            (
                F.floor(
                    F.sum(
                        F.when(
                            F.col("rank") == 1,
                            F.col("q").cast("decimal(24,12)"),
                        )
                    ).cast("double")
                    * 10_000
                    + F.lit(0.5)
                )
                / 10_000
            ).alias("kept_quality"),
        )
        .orderBy("lang")
    )
