"""Deterministic global shuffle + shard export — the last stage of a
training-data pipeline: every corpus build ends with "shuffle the
documents reproducibly and write N equal-ish shards" so data loaders
stream without seeking and epochs are reproducible across reruns.

Determinism: shard assignment and within-shard order both derive from
the portable affine id hash (operators/sampling.py) — pure row-local
expressions, so the layout is identical across runs, partitionings,
and engines (the q71 oracle re-derives it from the same constants).
`DataFrame.repartition` + `rand()` would give neither.

Scale: ONE shuffle, keyed on the shard id (uniform by construction —
the hash is uniform on [0, P)), then a within-partition sort; no
global sort, no driver involvement. At 100 TB pick n_shards ≈
corpus_bytes / target_shard_bytes and the shuffle stays balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .sampling import id_hash


def shuffle_shard(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every row a shard (hash mod n_shards) and its position
    within the shard's deterministic order (hash asc, id asc — the
    "global shuffle" order). Adds columns `shard` and `pos`."""
    h = id_hash(id_col)
    out = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % F.lit(n_shards)).cast("long")
    )
    w = W.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop(
        "_h"
    )


def write_shards(
    df: DataFrame, path: str, n_shards: int, id_col: str = "doc_id"
) -> None:
    """Materialize the shuffled corpus as one directory per shard with
    rows in shuffle order (parquet preserves within-file row order).
    Readers stream shard files sequentially — no shuffle at load time."""
    sharded = shuffle_shard(df, n_shards, id_col)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
