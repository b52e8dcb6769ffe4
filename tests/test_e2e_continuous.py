"""End-to-end continuous-ingestion day: streaming batches land in a
corpus LakeTable behind the dedup index, a COUNT/SUM rollup follows by
changelog deltas, and metadata maintenance compacts the snapshot log —
every piece from rounds 4-6 working against the SAME tables.

Flow per batch: probe SignatureIndex → drop near-dups → append
survivors to the corpus table + their signatures to the index (WAP) →
IVM refresh (delta) → repeat. Then DML (a takedown DELETE) flows
through the same rollup, and rewrite_manifests compacts metadata
without changing any answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml, maintenance
from de_gcp_lakehouse_iceberg_spark.lakehouse.dedup_index import SignatureIndex
from de_gcp_lakehouse_iceberg_spark.lakehouse.ivm import IncrementalRollup
from de_gcp_lakehouse_iceberg_spark.tables import table


def test_continuous_ingestion_day(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    corpus = LakeTable.create(spark, str(tmp_path / "corpus"))
    idx = SignatureIndex.create(spark, str(tmp_path / "idx"))

    # bootstrap with the even half
    seed = docs.filter(F.col("doc_id") % 2 == 0)
    corpus.append(seed, operation="bootstrap")
    idx.append(seed, wap=True)
    rollup = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), corpus, ["lang"], ["n_chars"]
    )

    def ingest_batch(batch):
        hits = (
            idx.probe(batch)
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        kept = batch.join(hits, "doc_id", "left_anti").localCheckpoint()
        corpus.append(kept, operation="ingest")
        idx.append(kept, wap=True)
        assert rollup.refresh()["mode"] == "delta"
        return kept.count()

    # batch 1: fresh odds + re-crawled copies of the corpus
    b1 = docs.filter(F.col("doc_id") % 4 == 1).unionByName(
        seed.limit(10).select(
            (F.col("doc_id") + 500_000).alias("doc_id"), "lang", "text",
            "n_chars",
        )
    )
    ingest_batch(b1)
    # batch 2: copies of batch-1 docs must now be caught by the index
    b2 = docs.filter(F.col("doc_id") % 4 == 1).limit(8).select(
        (F.col("doc_id") + 600_000).alias("doc_id"), "lang", "text",
        "n_chars",
    )
    kept2 = ingest_batch(b2)
    assert kept2 == 0  # everything in b2 is a dup of batch 1

    # invariant: rollup == recompute, index rows == corpus rows
    def check():
        got = {
            r["lang"]: (r["cnt"], float(r["sum_n_chars"]))
            for r in rollup.df().collect()
        }
        want = {
            r["lang"]: (r["cnt"], float(r["s"]))
            for r in corpus.scan()
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("n_chars").cast("decimal(28,6)")).alias("s"),
            )
            .collect()
        }
        assert got == want

    check()
    assert idx.df().count() == corpus.scan().count()

    # a takedown DELETE flows through the same delta path
    dml.delete(corpus, "doc_id % 10 = 4")
    assert rollup.refresh()["mode"] == "delta"
    check()

    # metadata compaction changes no answer
    pre = sorted(
        (r["lang"], r["cnt"]) for r in rollup.df().collect()
    )
    res = maintenance.rewrite_manifests(corpus, retention_days=0, keep_last=1)
    assert res["metadata_files_after"] < res["metadata_files_before"]
    check()
    assert sorted(
        (r["lang"], r["cnt"]) for r in rollup.df().collect()
    ) == pre
    # history of every commit survives the compaction
    assert corpus.history_df().count() >= 5
