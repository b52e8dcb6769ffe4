"""q109 — per-label embedding dispersion: the mean pairwise dot
product inside every label, computed WITHOUT the quadratic pair join
via the sum-vector identity

    mean_{i≠j} <v_i, v_j>  =  (‖Σv‖² − Σ‖v‖²) / (n·(n−1))

The dataset-diversity probe of an embedding corpus (tight clusters →
high mean pairwise similarity → low diversity; the SemDeDup/pruning
literature uses exactly this statistic to pick dedup thresholds).
At 100 TB this is ONE (label, dim) scalar shuffle — O(n·d) map-side
work, groups×dims reduce cells — where the naive pairwise form is
O(n²·d) and impossible.

Cross-engine determinism: Σv per dim and Σ‖v‖² are exact decimal sums
(order-independent); the per-dim sums are 6dp-quantized doubles whose
squares are computed and summed in EXACT decimal again, so ‖Σv‖² has
no float-accumulation order at all. The final subtraction / division /
sqrt are single IEEE ops on engine-identical inputs. (The 1e-6
quantization of Σv is part of the operator's contract, like q100's
centroid quantization.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .queries import _r, register


@register(
    "q109_embedding_dispersion",
    oracle="""
    WITH ex AS (
      SELECT label, i.i - 1 AS d, CAST(embedding[i.i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS i(i)),
    per_dim AS (
      SELECT label, d,
             floor(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                   * 1000000 + 0.5) / 1000000 AS s
      FROM ex GROUP BY label, d),
    ssq AS (
      SELECT label,
             CAST(sum(CAST(s AS DECIMAL(18,6)) * CAST(s AS DECIMAL(18,6)))
                  AS DOUBLE) AS ssq
      FROM per_dim GROUP BY label),
    sumsq AS (
      SELECT label,
             CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS vsq
      FROM ex GROUP BY label),
    cnt AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label)
    SELECT c.label, c.n AS n_vectors,
           floor((s.ssq - q.vsq) / (c.n * (c.n - 1)) * 1000000 + 0.5)
             / 1000000 AS mean_pair_dot,
           floor(sqrt(s.ssq) / c.n * 1000000 + 0.5) / 1000000
             AS centroid_norm,
           floor(q.vsq / c.n * 1000000 + 0.5) / 1000000 AS mean_sq_norm
    FROM cnt c JOIN ssq s ON s.label = c.label
    JOIN sumsq q ON q.label = c.label
    ORDER BY c.label
    """,
)
def q109_embedding_dispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("d", "x")
    ).select("label", "d", F.col("x").cast("double").alias("x"))
    per_dim = ex.groupBy("label", "d").agg(
        (
            F.floor(
                F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                * 1_000_000
                + F.lit(0.5)
            )
            / 1_000_000
        ).alias("s")
    )
    sd = F.col("s").cast("decimal(18,6)")
    ssq = per_dim.groupBy("label").agg(
        F.sum(sd * sd).cast("double").alias("ssq")
    )
    sumsq = ex.groupBy("label").agg(
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)"))
        .cast("double")
        .alias("vsq")
    )
    cnt = emb.groupBy("label").agg(F.count("*").alias("n_vectors"))
    n = F.col("n_vectors")
    return (
        cnt.join(ssq, "label")
        .join(sumsq, "label")
        .select(
            "label",
            "n_vectors",
            _r((F.col("ssq") - F.col("vsq")) / (n * (n - 1)), 6).alias(
                "mean_pair_dot"
            ),
            _r(F.sqrt(F.col("ssq")) / n, 6).alias("centroid_norm"),
            _r(F.col("vsq") / n, 6).alias("mean_sq_norm"),
        )
        .orderBy("label")
    )
