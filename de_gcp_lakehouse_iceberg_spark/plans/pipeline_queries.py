"""q50-q53 — the corpus-construction pipeline stages beyond cleaning:
deterministic data mixing, stratified downsampling, sequence packing
into context windows, and near-dup cluster assignment. Every oracle is
generated from the SAME Python constants/thresholds as the Spark plan
(integer hash arithmetic — no float divergence is possible), and q53's
iterative connected components are checked against a DuckDB recursive
transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dup_clusters_star, near_dup_pairs
from ..operators.packing import chunk_stats, pack_chunks
from ..operators.sampling import (
    id_hash_sql,
    sample_by_weights,
    stratified_sample,
    threshold,
)
from ..tables import table
from .dedup_queries import _SHINGLE_SQL
from .queries import register

# --------------------------------------------------------------------------
# q50 — data mixing: per-language keep rates via the portable id hash.
# The standard "source weights" step of a corpus build, as one scan-time
# filter (no shuffle; the predicate pushes into the parquet scan).
# --------------------------------------------------------------------------
_MIX_WEIGHTS = {"en": 0.9, "zh": 0.75, "de": 0.5}
_MIX_DEFAULT = 0.25


def _mix_threshold_sql() -> str:
    case = " ".join(
        f"WHEN lang = '{k}' THEN {threshold(r)}"
        for k, r in sorted(_MIX_WEIGHTS.items())
    )
    return f"(CASE {case} ELSE {threshold(_MIX_DEFAULT)} END)"


@register(
    "q50_source_mix",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS total_docs,
           CAST(sum(CASE WHEN {id_hash_sql('doc_id')} < {_mix_threshold_sql()}
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(sum(CASE WHEN {id_hash_sql('doc_id')} < {_mix_threshold_sql()}
                         THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q50_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    kept = sample_by_weights(
        docs, _MIX_WEIGHTS, key_col="lang", default_rate=_MIX_DEFAULT
    )
    totals = docs.groupBy("lang").agg(F.count("*").alias("total_docs"))
    kept_agg = kept.groupBy("lang").agg(
        F.count("*").alias("kept_docs"),
        F.sum("doc_id").alias("kept_id_sum"),  # pins the SELECTION, not just counts
    )
    return (
        totals.join(kept_agg, "lang", "left")
        .select(
            "lang",
            "total_docs",
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_id_sum", F.lit(0)).alias("kept_id_sum"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q51 — sequence packing: concat-then-chunk documents per language into
# 512-token context windows; per-chunk load + fill ratio.
# --------------------------------------------------------------------------
_CAPACITY = 512


@register(
    "q51_pack_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS tok_offset
      FROM toks),
    chunks AS (
      SELECT lang,
             (tok_offset - tok_offset % {_CAPACITY}) / {_CAPACITY} AS chunk_id,
             CAST(count(*) AS BIGINT) AS doc_count,
             CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
      FROM packed GROUP BY lang, chunk_id)
    SELECT lang, CAST(chunk_id AS BIGINT) AS chunk_id, doc_count, chunk_tokens,
           floor(CAST(chunk_tokens AS DOUBLE) / {_CAPACITY} * 10000 + 0.5)
             / 10000 AS fill_ratio
    FROM chunks
    ORDER BY lang, chunk_id
    """,
)
def q51_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    packed = pack_chunks(docs, capacity=_CAPACITY, stream_col="lang")
    return chunk_stats(packed, capacity=_CAPACITY, stream_col="lang").orderBy(
        "lang", "chunk_id"
    )


# --------------------------------------------------------------------------
# q52 — stratified downsampling: exactly min(5, |source|) docs per
# source, chosen by hash order (deterministic, unbiased).
# --------------------------------------------------------------------------
_STRATUM_N = 5


@register(
    "q52_stratified_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY {id_hash_sql('doc_id')}, doc_id) AS rn
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS sampled_docs,
           CAST(sum(doc_id) AS BIGINT) AS sampled_id_sum
    FROM ranked WHERE rn <= {_STRATUM_N}
    GROUP BY source
    ORDER BY source
    """,
)
def q52_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    picked = stratified_sample(docs, _STRATUM_N, stratum_col="source")
    return (
        picked.groupBy("source")
        .agg(
            F.count("*").alias("sampled_docs"),
            F.sum("doc_id").alias("sampled_id_sum"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q53 — near-dup cluster assignment: connected components over the exact
# Jaccard pair graph (alternating large-star/small-star in Spark — the
# skew-safe O(log n)-round variant; the oracle replays it as a recursive
# transitive closure — both converge to cluster_id = min reachable id).
# --------------------------------------------------------------------------
@register(
    "q53_dup_clusters",
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
      FROM reach GROUP BY src)
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
    FROM labels
    GROUP BY cluster_id
    ORDER BY cluster_id
    """,
)
def q53_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # route-selected pair source (exact at gate scale, LSH past the
    # fan-out threshold — same pair set either way, see near_dup_pairs)
    pairs = near_dup_pairs(docs, threshold=0.5)
    clusters = dup_clusters_star(pairs)
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"))
        .orderBy("cluster_id")
    )
