"""KMV (k-minimum-values) distinct-count sketch — the mergeable
cardinality sketch for dashboard/maintenance rollups at 100 TB, built
on the engine's portable hash so the estimate is BIT-IDENTICAL across
engines (Spark's approx_count_distinct is HLL++ with an engine-private
hash — useful, but not oracle-checkable; KMV with the affine hash is).

Theory (Bar-Yossef et al. 2002): hash every value uniformly into
[0, P); keep the k smallest DISTINCT hashes per group. If fewer than k
distinct values exist the sketch IS the exact count; otherwise the
k-th smallest hash h_k estimates density and
``distinct ≈ (k−1) · P / h_k``. Integer floor-division keeps the
estimate exact-replayable (no float rounding between engines).

Scale: one shuffle of (group, hash) pairs — and the sketch is
MERGEABLE (union the min-k sets, re-take the min-k), so partial
sketches per partition/day/shard combine without re-scanning: the
property that makes sketch rollup tables work (`merge_kmv`).
Relative error ≈ 1/√(k−2) (~13% at k=64, ~4% at k=1024).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import SAMPLE_P, id_hash, id_hash_sql


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: (group_cols…, hashes array<long> — the ≤k
    smallest distinct hashes, ascending).

    Two-phase min-k (no global per-group sort): phase 1 keeps the min-k
    per (group, input-partition) — every cell's rows live in ONE map
    partition, so the set dedup happens map-side; phase 2 merges the
    partial min-k arrays, whose total size is bounded by
    k × #partitions per group instead of |distinct|. The old
    single-window form shuffled EVERY distinct hash of a group to one
    task — the exact skew hot-spot this removes (min-k of a union ==
    min-k of per-part min-k's, so results are bit-identical)."""
    minset = F.slice(F.array_sort(F.collect_set("_h")), 1, k)
    partial = (
        df.select(*group_cols, id_hash(F.col(value_col)).alias("_h"))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy(*group_cols, "_pid")
        .agg(minset.alias("_ph"))
    )
    return (
        partial.select(*group_cols, F.explode("_ph").alias("_h"))
        .groupBy(*group_cols)
        .agg(minset.alias("hashes"))
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(group_cols…, distinct_est long): exact when |hashes| < k, else
    floor((k−1)·P / h_k) — pure integer arithmetic."""
    n = F.size("hashes")
    kth = F.element_at("hashes", k)
    est = F.when(n < k, n.cast("long")).otherwise(
        F.floor(F.lit((k - 1) * SAMPLE_P) / kth).cast("long")
    )
    return sketch.withColumn("distinct_est", est).drop("hashes")


def merge_kmv(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge two sketch tables (outer on groups): union the hash sets,
    re-take the min-k — the rollup operation (day sketches → month
    sketch without touching rows)."""
    merged = (
        a.select(*group_cols, "hashes")
        .unionByName(b.select(*group_cols, "hashes"))
        .select(*group_cols, F.explode("hashes").alias("_h"))
    )
    # inputs are already ≤k per sketch row: one bounded set-agg, no
    # window/global sort needed (collect_set dedups shared hashes)
    return merged.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("hashes")
    )


def kmv_sql(group_expr: str, value_expr: str, table: str, k: int = 64) -> str:
    """The identical estimator in ANSI/DuckDB SQL (oracle generation)."""
    return f"""
    hashed AS (
      SELECT DISTINCT {group_expr} AS g,
             {id_hash_sql(value_expr)} AS h
      FROM {table}),
    ranked AS (
      SELECT g, h,
             row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM hashed),
    sk AS (
      SELECT g, count(*) AS n, max(h) AS kth
      FROM ranked WHERE rn <= {k} GROUP BY g),
    est AS (
      SELECT g,
             CASE WHEN n < {k} THEN n
                  ELSE CAST(floor(CAST({(k - 1) * SAMPLE_P} AS DOUBLE)
                                  / kth) AS BIGINT)
             END AS distinct_est
      FROM sk)
    """
