"""q72 — duplicated-span coverage per language (Lee et al. 2021
span-level exact-substring dedup; operators/dedup.dup_span_stats).

The oracle replays the position machinery on n-gram STRINGS where the
Spark plan groups their xxhash64 (q35's integer-shuffle scale
pattern) — identical barring 64-bit collisions; the interval-union
fold (lead window, min(gap, n)) is exact integer arithmetic in both
engines, and the final ratio is one double division of exact ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dup_span_stats
from ..tables import table
from .queries import _r, register

_N = 3


@register(
    "q72_dup_span_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    pos AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, greatest(len(t) - {_N - 1}, 0)),
               i -> struct_pack(
                 p := i,
                 s := array_to_string(list_slice(t, i + 1, i + {_N}), ' ')
               ))) AS x
      FROM toks),
    pos2 AS (SELECT doc_id, x.p AS p, x.s AS s FROM pos),
    dup_grams AS (
      SELECT s FROM pos2 GROUP BY s HAVING count(*) >= 2),
    dup AS (
      SELECT pos2.doc_id, pos2.p
      FROM pos2 JOIN dup_grams USING (s)),
    led AS (
      SELECT doc_id, p,
             lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS np
      FROM dup),
    cov AS (
      SELECT doc_id,
             sum(CASE WHEN np IS NULL THEN {_N}
                      ELSE least(np - p, {_N}) END) AS covered
      FROM led GROUP BY doc_id),
    per_doc AS (
      SELECT t.doc_id, t.lang,
             CAST(len(t.t) AS BIGINT) AS n_tokens,
             CAST(coalesce(c.covered, 0) AS BIGINT) AS covered
      FROM toks t LEFT JOIN cov c USING (doc_id))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(covered) AS BIGINT) AS covered_tokens,
           floor(CAST(sum(covered) AS DOUBLE) / sum(n_tokens)
                 * 1000000 + 0.5) / 1000000 AS coverage_ratio,
           CAST(count(*) FILTER (WHERE covered * 2 >= n_tokens)
                AS BIGINT) AS half_covered_docs
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def q72_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    stats = dup_span_stats(docs, n=_N)
    labeled = stats.join(docs.select("doc_id", "lang"), "doc_id")
    return (
        labeled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("covered_tokens").alias("covered_tokens"),
            _r(
                F.sum("covered_tokens").cast("double")
                / F.sum("n_tokens"),
                6,
            ).alias("coverage_ratio"),
            F.sum(
                (F.col("covered_tokens") * 2 >= F.col("n_tokens"))
                .cast("long")
            ).alias("half_covered_docs"),
        )
        .orderBy("lang")
    )
