"""Maintained MinHash signature index (lakehouse/dedup_index.py):
probe-vs-stored == probe-vs-recomputed, WAP exactly-once ingest, and
snapshot consistency across appends."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse.dedup_index import SignatureIndex
from de_gcp_lakehouse_iceberg_spark.operators.dedup import (
    lsh_probe_pairs,
    signature_index,
)
from de_gcp_lakehouse_iceberg_spark.tables import table


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").select("doc_id", "text")


def _pairs_set(df):
    return {
        (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in df.collect()
    }


def test_stored_probe_equals_recomputed(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 4 == 1).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 500_000).alias("doc_id"), "text"
        )
    )
    idx = SignatureIndex.create(spark, str(tmp_path / "idx"))
    idx.append(corpus, wap=True)
    stored = _pairs_set(idx.probe(batch))
    recomputed = _pairs_set(
        lsh_probe_pairs(batch, corpus, hash_mode="portable")
    )
    assert stored == recomputed and stored  # non-empty: planted dups


def test_stored_rows_equal_signature_index_output(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    idx = SignatureIndex.create(spark, str(tmp_path / "idx"))
    idx.append(docs, wap=True)
    stored = {
        (r["doc_id"], tuple(r["keys"]), tuple(r["sig"]))
        for r in idx.df().collect()
    }
    direct = {
        (r["doc_id"], tuple(r["keys"]), tuple(r["sig"]))
        for r in signature_index(docs).collect()
    }
    assert stored == direct


def test_append_is_snapshot_consistent(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 4 == 1)
    idx = SignatureIndex.create(spark, str(tmp_path / "idx"))
    r1 = idx.append(first, wap=True)
    v1 = r1["version"]
    n1 = idx.df().count()
    # a probe pinned to v1 must not see the second batch's signatures
    r2 = idx.append(second, wap=True)
    assert r2["version"] == v1 + 1
    assert idx.table.staged_ids() == []  # WAP published, nothing dangling
    assert idx.df(version=v1).count() == n1
    assert idx.df().count() == n1 + r2["rows"]
    # time-traveled probe == probe against a fresh index of only batch 1
    batch = docs.filter(F.col("doc_id") % 4 == 3).limit(50)
    pinned = _pairs_set(idx.probe(batch, version=v1))
    fresh = SignatureIndex.create(spark, str(tmp_path / "idx2"))
    fresh.append(first, wap=True)
    assert pinned == _pairs_set(fresh.probe(batch))


def test_family_pinned_and_probe_guard(spark, sf_dir, tmp_path):
    idx = SignatureIndex.create(
        spark, str(tmp_path / "idx"), n=2, num_hashes=32
    )
    idx.append(_docs(spark, sf_dir).limit(20), wap=True)
    re = SignatureIndex.load(spark, str(tmp_path / "idx"))
    assert (re.n, re.num_hashes) == (2, 32)
    # stored rows carry 32-hash signatures
    row = re.df().select(F.size("sig").alias("s")).first()
    assert row["s"] == 32
    with pytest.raises(ValueError):
        lsh_probe_pairs(
            _docs(spark, sf_dir).limit(5),
            None,
            hash_mode="xxhash64",
            corpus_index=re.df(),
        )
    with pytest.raises(ValueError):
        lsh_probe_pairs(_docs(spark, sf_dir).limit(5), None)


def test_dedup_batch_ingests_survivors_only(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    idx = SignatureIndex.create(spark, str(tmp_path / "idx"))
    idx.append(corpus, wap=True)
    n0 = idx.df().count()
    # batch = fresh odd docs + exact copies of corpus docs (must drop)
    batch = docs.filter(F.col("doc_id") % 4 == 1).limit(30).unionByName(
        corpus.limit(10).select(
            (F.col("doc_id") + 900_000).alias("doc_id"), "text"
        )
    )
    kept = idx.dedup_batch(batch)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert all(i < 900_000 for i in kept_ids)  # every copy dropped
    assert idx.df().count() == n0 + len(kept_ids)
