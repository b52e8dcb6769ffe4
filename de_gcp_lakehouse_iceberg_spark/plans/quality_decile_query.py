"""q111 — per-source quality calibration: p50/p90 quality per source
from mergeable histogram sketches, the GLOBAL p90 from the SAME
sketches re-merged (never re-scanning the corpus), and each source's
count of docs clearing the global bar.

The curation decision this feeds: threshold per-source or globally?
A source whose p90 sits below the global p90 contributes almost
nothing to the top decile — cap it (q94) or down-weight it (q65).
At 100 TB the corpus is scanned ONCE for bin counts (≤ bins cells per
source); quantiles, the global re-merge, and the calibration join are
all sketch-sized. The global histogram is literally the per-source
histograms summed — the mergeability that makes this a rollup-table
pattern (q101's sliding windows use the same property over time).

Cross-engine determinism: the quality score is the q31 fixed
expression tree (identical doubles in both engines), bin assignment is
one floor() on that double, quantile interpolation is the shared
6dp-quantized estimator (`hist_quantile_sql` mirrors it 1:1), and the
calibration count compares identical doubles against the quantized
threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..operators.sketches import hist_quantile, hist_quantile_sql, hist_sketch
from ..tables import table
from .queries import register
from .text_queries import _QUALITY_SQL_EXPR

_BINS = 256


@register(
    "q111_quality_calibration",
    oracle=f"""
    WITH scored AS MATERIALIZED (
      SELECT source, {_QUALITY_SQL_EXPR} AS score FROM documents),
    {hist_quantile_sql("source", "score", "scored", 0.5, 0.0, 1.0, _BINS, "p50")},
    {hist_quantile_sql("source", "score", "scored", 0.9, 0.0, 1.0, _BINS, "p90")},
    {hist_quantile_sql("1", "score", "scored", 0.9, 0.0, 1.0, _BINS, "g90")},
    counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(*) FILTER (
               WHERE score >= (SELECT est FROM g90)) AS BIGINT)
               AS above_global_p90
      FROM scored GROUP BY source)
    SELECT c.source, c.n_docs,
           p50.est AS p50_quality,
           p90.est AS p90_quality,
           (SELECT est FROM g90) AS global_p90,
           c.above_global_p90
    FROM counts c
    JOIN p50 ON p50.g = c.source
    JOIN p90 ON p90.g = c.source
    ORDER BY c.source
    """,
)
def q111_quality_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "source", quality_score("text").alias("score")
    )
    sk = hist_sketch(scored, ["source"], "score", 0.0, 1.0, _BINS)
    p50 = hist_quantile(sk, ["source"], 0.5, 0.0, 1.0, _BINS).select(
        F.col("source"), F.col("est").alias("p50_quality")
    )
    p90 = hist_quantile(sk, ["source"], 0.9, 0.0, 1.0, _BINS).select(
        F.col("source"), F.col("est").alias("p90_quality")
    )
    # global histogram = per-source histograms summed (mergeable —
    # the corpus is NOT rescanned for the global quantile)
    gsk = sk.groupBy("b").agg(F.sum("cnt").alias("cnt")).withColumn(
        "g", F.lit(1)
    )
    g90 = hist_quantile(gsk, ["g"], 0.9, 0.0, 1.0, _BINS).select(
        F.col("est").alias("global_p90")
    )
    counts = (
        scored.crossJoin(F.broadcast(g90))
        .groupBy("source", "global_p90")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(
                F.col("score") >= F.col("global_p90")
            ).alias("above_global_p90"),
        )
    )
    return (
        counts.join(F.broadcast(p50), "source")
        .join(F.broadcast(p90), "source")
        .select(
            "source",
            "n_docs",
            "p50_quality",
            "p90_quality",
            "global_p90",
            "above_global_p90",
        )
        .orderBy("source")
    )
