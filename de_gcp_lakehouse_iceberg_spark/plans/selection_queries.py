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
