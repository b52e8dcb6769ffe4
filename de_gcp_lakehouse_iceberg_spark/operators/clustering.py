"""Distributed k-means (Lloyd's algorithm) over an embedding column —
the clustering primitive behind IVF index builds, corpus bucketing, and
diversity sampling in training-data pipelines (the reference has no ML
surface; this extends SURVEY.md §7.1 step 10's similarity family).

Cross-engine determinism (the driver hash-compares against a DuckDB
oracle that unrolls the same iterations):

- vectors are fixed-point quantized ONCE (``q = floor(x·QUANT + 0.5)``,
  the same trick operators/similarity.py uses) — every cross-row
  aggregate (the per-dimension component sums that form new centroids)
  is then an INTEGER sum: exact and order-independent, so shuffle
  order cannot perturb the result;
- per-row math (squared-L2 distance to each centroid, centroid norms)
  runs as a sequential ``F.aggregate`` fold in DOUBLE over the dims —
  fixed evaluation order, bit-identical to DuckDB's ``list_sum`` fold
  (the q38 cosine oracle pins this equivalence);
- assignment ties break to the lowest centroid id; empty clusters keep
  their previous centroid.

Scale posture: per iteration, assignment is a broadcast of k·d doubles
against a narrow projection (no shuffle), and the update is ONE
shuffle of (k·d) integer partial sums — map-side combine reduces each
partition to ≤ k·d rows before the exchange. The Catalyst fold is
interpreted (not codegen); for bulk scoring at 100 TB swap the
assignment expression for the Arrow pandas-UDF path used by
operators/similarity.py (numpy matmul) — kept out of the default
because SIMD summation order can flip argmin on near-ties, breaking
oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .similarity import QUANT


def quantize(vec_col, quant: int = QUANT):
    """float array → integer fixed-point array (deterministic in any
    engine: floor(x·Q + 0.5) on the double-widened component)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * quant + F.lit(0.5)).cast("long")
    )


def _sq_dist(a, b):
    """Sequential-fold squared L2 distance in double (fixed dim order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = QUANT,
) -> DataFrame:
    """Lloyd's k-means on the quantized vectors; returns the final
    assignment (id_col, cluster_id, dist) after `iters` update rounds.

    Init: centroids = the k lowest-id vectors (deterministic and
    engine-independent; at scale swap for a seeded hash-sample — the
    published k-means|| init is a drop-in here).
    """
    qv = vectors.select(
        F.col(id_col).alias("vec_id"), quantize(vec_col, quant).alias("q")
    )
    # init: k lowest ids, cluster ids 0..k-1 in vec_id order
    centroids = (
        qv.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(W.orderBy("vec_id")) - 1).alias("cid"),
            F.transform("q", lambda x: x.cast("double")).alias("c"),
        )
    )

    def assign(cents: DataFrame) -> DataFrame:
        scored = qv.join(F.broadcast(cents)).select(
            "vec_id", "q", "cid", _sq_dist(F.col("q"), F.col("c")).alias("dist")
        )
        w = W.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("cid").asc())
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    for _ in range(iters):
        assigned = assign(centroids)
        # integer partial sums per (cluster, dim) — order-independent;
        # mean = exact integer sum widened to double / count
        sums = (
            assigned.select("cid", F.posexplode("q").alias("pos", "comp"))
            .groupBy("cid", "pos")
            .agg(F.sum("comp").alias("s"), F.count("*").alias("n"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "s", "n"))
                    ),
                    lambda t: t["s"].cast("double") / t["n"],
                ).alias("c")
            )
        )
        # empty clusters keep their previous centroid
        centroids = (
            centroids.alias("old")
            .join(sums.alias("new"), "cid", "left")
            .select("cid", F.coalesce("new.c", "old.c").alias("c"))
        ).localCheckpoint()
    return assign(centroids).select("vec_id", "cid", "dist")
