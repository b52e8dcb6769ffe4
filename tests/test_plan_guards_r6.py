"""Plan-shape guards for the round-6 operators: the properties that
make them scale-safe must be visible in the physical plan, so a
refactor that silently reintroduces a cartesian product, a full-corpus
window, or a driver-side collapse fails here."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators.dedup import ngram_jaccard_pairs
from de_gcp_lakehouse_iceberg_spark.operators.multimodal import (
    dhash_media,
    dhash_near_pairs,
)
from de_gcp_lakehouse_iceberg_spark.operators.similarity import (
    centroid_rollup,
    sq8_topk,
)
from de_gcp_lakehouse_iceberg_spark.tables import table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dhash_pairs_is_bucketed_not_cartesian(spark, sf_dir):
    sigs = spark.range(100).select(
        F.col("id").alias("media_id"), (F.col("id") % 17).alias("dhash")
    )
    p = _plan(dhash_near_pairs(sigs))
    assert "CartesianProduct" not in p
    assert "Window" not in p


def test_centroid_rollup_partial_aggregates_no_window(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    p = _plan(centroid_rollup(emb))
    assert "Window" not in p
    # the (group, dim) aggregation must combine map-side
    assert "partial" in p.lower()


def test_sq8_candidates_avoid_global_window(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    out = sq8_topk(emb, emb.filter(F.col("vec_id") < 2), k=5, rerank=10)
    p = _plan(out)
    # NO Window nodes at all since r10: both the candidate selection
    # AND the exact-cosine rerank run as the two-phase grouped top-k
    # (partial top-k collapses map-side; no per-query sort task)
    assert "Window" not in p
    assert "CartesianProduct" not in p.replace(
        "BroadcastNestedLoopJoin", ""
    )  # the broadcast query-side cross is the intended tiny side


def test_jaccard_fast_path_has_no_string_shingle_shuffle(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, threshold=0.5)
    p = _plan(out)
    # The invariant: per-doc signing is ONE lazy Arrow stage whose long
    # keys feed the inverted-index join — no exploded shingle STRINGS
    # are ever hashed/shuffled, and the signing is not eagerly
    # materialized at call time (r7's eager localCheckpoint hid the
    # stage behind `Scan ExistingRDD` and serialized through the RDD
    # block manager — slower AND unguardable).
    assert "Scan ExistingRDD" not in p  # lazy: no pre-materialized RDD
    assert "ArrowEvalPython" in p or "PythonUDF" in p
    assert "xxhash64" not in p
    assert "CartesianProduct" not in p
    # every consumer reads the signing result from the columnar cache —
    # exactly one signing pass at execution time
    assert "InMemoryTableScan" in p


def test_dhash_media_is_single_pass(spark):
    import numpy as np

    img = np.zeros(10 * 8 * 3, dtype=np.uint8).tobytes()
    media = spark.createDataFrame(
        [(1, "raw_rgb", img, {"width": 10, "height": 8,
                              "sample_rate": None, "n_bytes": 240})],
        "media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_bytes:bigint>",
    )
    p = _plan(dhash_media(media))
    assert "Exchange" not in p  # zero shuffle: embarrassingly parallel
