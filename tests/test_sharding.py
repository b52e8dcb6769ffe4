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
    docs = table(spark, sf_dir, "documents", spread_corpus=False).select("doc_id")
    plan = (
        shuffle_shard(docs, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_webdataset_export_roundtrip_and_determinism(spark, sf_dir, tmp_path):
    """Tar shards must contain every doc exactly once in the
    deterministic shuffle order, and a re-export must be byte-identical
    (pinned mtimes + stable member order) — the reproducible-epoch
    contract."""
    import hashlib
    import json
    import tarfile

    from de_gcp_lakehouse_iceberg_spark.operators.sharding import (
        shuffle_shard,
        write_webdataset,
    )
    from de_gcp_lakehouse_iceberg_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(200)
    out1 = str(tmp_path / "wds1")
    shards = write_webdataset(
        docs, out1, n_shards=4, meta_cols=["lang", "source"]
    )
    assert len(shards) == 4

    seen = {}
    for sp in shards:
        with tarfile.open(sp) as tf:
            names = tf.getnames()
            txts = [n for n in names if n.endswith(".txt")]
            for n in txts:
                key = int(n[:-4])
                meta = json.load(
                    tf.extractfile(n[:-4] + ".json")
                )
                seen[key] = (
                    tf.extractfile(n).read().decode(),
                    meta["lang"],
                    meta["__pos__"],
                )
    rows = {r["doc_id"]: (r["text"], r["lang"]) for r in docs.collect()}
    assert set(seen) == set(rows)
    for k, (txt, lang, _pos) in seen.items():
        assert (txt, lang) == rows[k]

    # positions match shuffle_shard's deterministic order
    expect = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shard(docs, 4).collect()
    }
    for sp in shards:
        shard_no = int(sp.split("-")[-1].split(".")[0])
        with tarfile.open(sp) as tf:
            for n in tf.getnames():
                if n.endswith(".json"):
                    key = int(n[:-5])
                    meta = json.load(tf.extractfile(n))
                    assert expect[key] == (shard_no, meta["__pos__"])

    # byte-stable re-export
    out2 = str(tmp_path / "wds2")
    shards2 = write_webdataset(
        docs, out2, n_shards=4, meta_cols=["lang", "source"]
    )
    for a, b in zip(shards, shards2):
        ha = hashlib.sha256(open(a, "rb").read()).hexdigest()
        hb = hashlib.sha256(open(b, "rb").read()).hexdigest()
        assert ha == hb


def test_webdataset_binary_payloads(spark, tmp_path):
    import tarfile

    from de_gcp_lakehouse_iceberg_spark.operators.sharding import (
        write_webdataset,
    )

    media = spark.createDataFrame(
        [(i, f"cap {i}", bytes([i] * 10)) for i in range(20)],
        "doc_id long, text string, payload binary",
    )
    out = str(tmp_path / "wds")
    shards = write_webdataset(
        media, out, n_shards=2, payload_col="payload", payload_ext="img"
    )
    found = 0
    for sp in shards:
        with tarfile.open(sp) as tf:
            for n in tf.getnames():
                if n.endswith(".img"):
                    key = int(n[:-4])
                    assert tf.extractfile(n).read() == bytes([key] * 10)
                    found += 1
    assert found == 20
