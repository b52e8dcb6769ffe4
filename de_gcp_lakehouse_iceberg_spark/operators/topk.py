"""Two-phase grouped top-k — the bounded-state form of
`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`.

The window form shuffles EVERY row of a group to one task and sorts
there — at 100 TB a hot group (one retailer, one language, one day)
becomes a straggler. Two-phase instead:

  phase 1: per (group, input partition) keep only the top-k — a
           sorted-array slice aggregate whose dedup/sort happens
           map-side (same shape as kmv_sketch's min-k);
  phase 2: merge the partial top-k arrays — input bounded by
           k x #partitions per group, never |group|.

Ordering is made DETERMINISTIC by appending the caller's tie-break
columns to the sort key, so the result is exactly the window form's
rows (oracle-checkable, q85).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group under lexicographic `order_cols` ASCENDING
    (wrap a column in F.desc-semantics by negating / inverting it at
    the call site — struct array_sort is ascending-only). `order_cols`
    must be a total order (include tie-breaks) for determinism.

    Returns the original columns plus `rank` (1-based position within
    the group)."""
    payload = [c for c in df.columns if c not in group_cols]
    keyed = df.select(
        *group_cols,
        F.struct(
            *[c.alias(f"_o{i}") for i, c in enumerate(order_cols)],
            F.struct(*payload).alias("_row"),
        ).alias("_kr"),
    )
    topk = F.slice(F.array_sort(F.collect_list("_kr")), 1, k)
    partial = (
        keyed.withColumn("_pid", F.spark_partition_id())
        .groupBy(*group_cols, "_pid")
        .agg(topk.alias("_pk"))
    )
    merged = (
        partial.select(*group_cols, F.explode("_pk").alias("_kr"))
        .groupBy(*group_cols)
        .agg(topk.alias("_pk"))
    )
    return merged.select(
        *group_cols,
        F.posexplode("_pk").alias("_pos", "_kr"),
    ).select(
        *group_cols,
        (F.col("_pos") + 1).alias("rank"),
        F.col("_kr._row.*"),
    )
