"""Deterministic shuffle-shard export (operators/sharding.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators.sharding import (
    shuffle_shard,
    write_shards,
)
from de_gcp_lakehouse_iceberg_spark.tables import table


def test_shuffle_shard_partition_independent(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id")
    a = shuffle_shard(docs.repartition(7), 4).collect()
    b = shuffle_shard(docs.coalesce(1), 4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # every row gets exactly one shard/pos; positions are 1..n per shard
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert set(by_shard) <= set(range(4))


def test_write_shards_layout_and_order(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    docs = table(spark, sf_dir, "documents").select("doc_id")
    out = str(tmp_path / "shards")
    write_shards(docs, out, n_shards=4)

    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 4
    # within-file row order IS the shuffle order (pos ascending)
    for d in dirs:
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1            # one file per shard
        t = pq.read_table(files[0]).to_pydict()
        assert t["pos"] == sorted(t["pos"])

    # read-back equals the logical assignment
    back = spark.read.parquet(out).select("doc_id", "shard", "pos")
    logical = shuffle_shard(docs, 4)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, logical.select("doc_id", "shard", "pos").collect())
    )


def test_shuffle_shard_single_exchange_plan(spark, sf_dir):
    """write_shards' repartition(n, shard) is the only corpus shuffle
    (the row_number window reuses the same hash partitioning when
    keyed on shard)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    plan = (
        shuffle_shard(docs, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
