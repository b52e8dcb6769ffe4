"""Streaming incremental dedup (streaming/dedup_stream.py): batches
probe the stored SignatureIndex, survivors' signatures are ingested so
later batches dedup against them, replays are exactly-once."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse.dedup_index import SignatureIndex
from de_gcp_lakehouse_iceberg_spark.streaming.dedup_stream import (
    streaming_dedup_ingest,
)
from de_gcp_lakehouse_iceberg_spark.tables import table


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").select("doc_id", "text")


def _write_batch(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _stream(spark, root):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(root + "/*/")
    )


def test_stream_dedups_against_index_and_itself(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    idx = SignatureIndex.create(spark, str(tmp_path / "idx"))
    idx.append(corpus, wap=True)
    n0 = idx.df().count()

    fresh1 = docs.filter(F.col("doc_id") % 4 == 1).limit(20)
    n_fresh1 = fresh1.count()
    # the documents table carries NATURAL near-dups across the
    # corpus/fresh split — precompute which fresh docs the (proven)
    # batch probe drops, so streaming expectations are exact
    from de_gcp_lakehouse_iceberg_spark.operators.dedup import (
        lsh_probe_pairs,
    )

    nat_hits = {
        r["new_id"]
        for r in lsh_probe_pairs(
            fresh1, corpus, hash_mode="portable"
        ).collect()
    }
    kept1_expected = [
        r["doc_id"]
        for r in fresh1.select("doc_id").collect()
        if r["doc_id"] not in nat_hits
    ]
    # batch 1: fresh odd docs + verbatim copies of corpus docs
    b1 = fresh1.unionByName(
        corpus.limit(8).select(
            (F.col("doc_id") + 700_000).alias("doc_id"), "text"
        )
    )
    # batch 2: copies of docs batch 1 KEPT (proves the index grew
    # mid-stream) + two IDENTICAL never-seen docs arriving together
    # (in-batch dedup). The identical pair is synthetic text so it
    # can't collide with anything natural.
    surv = docs.filter(F.col("doc_id").isin(kept1_expected[:6]))
    novel = "qz%d xj%d vk%d wq%d jx%d zq%d kx%d qv%d xw%d jz%d"
    spice_text = " ".join(novel.split()) % tuple(range(10))
    spice = spark.createDataFrame(
        [(900_000, spice_text), (900_001, spice_text)],
        "doc_id long, text string",
    )
    b2 = surv.select(
        (F.col("doc_id") + 800_000).alias("doc_id"), "text"
    ).unionByName(spice)
    src = str(tmp_path / "src")
    _write_batch(b1, src + "/b1")
    _write_batch(b2, src + "/b2")

    stats = streaming_dedup_ingest(_stream(spark, src), idx)
    assert stats["batches"] == 2
    # batch1: corpus copies + natural near-dups dropped, rest kept
    # batch2: all 6 kept-doc copies dropped, ONE of the pair kept
    assert stats["kept"] == len(kept1_expected) + 1
    assert stats["dropped"] == (8 + len(nat_hits)) + 6 + 1
    ids = {r["doc_id"] for r in idx.df().select("doc_id").collect()}
    assert not any(700_000 <= i < 900_000 for i in ids)
    assert len([i for i in ids if i >= 900_000]) == 1
    assert idx.df().count() == n0 + stats["kept"]


def test_stream_replay_is_exactly_once(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    idx = SignatureIndex.create(spark, str(tmp_path / "idx"))
    idx.append(docs.filter(F.col("doc_id") % 2 == 0), wap=True)
    src = str(tmp_path / "src")
    _write_batch(docs.filter(F.col("doc_id") % 4 == 1).limit(10),
                 src + "/b1")
    s1 = streaming_dedup_ingest(_stream(spark, src), idx)
    v1 = idx.table.current_version()
    # same checkpoint → offsets replay nothing
    s2 = streaming_dedup_ingest(_stream(spark, src), idx)
    assert s1["batches"] == 1 and s2["batches"] == 0
    assert idx.table.current_version() == v1
    # checkpoint wiped → Spark replays batch 0, the index watermark
    # skips it (no double-append, no self-dedup wipeout)
    import shutil

    shutil.rmtree(f"{idx.table.root}/_checkpoints", ignore_errors=True)
    s3 = streaming_dedup_ingest(_stream(spark, src), idx)
    assert s3["batches"] == 0
    assert idx.table.current_version() == v1
