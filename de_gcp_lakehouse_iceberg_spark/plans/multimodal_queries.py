"""Multimodal query corpus entry — documents' text encoded as binary
payloads (the in-container stand-in for image/audio bytes), aggregated
byte-level stats per source. The oracle recomputes octet lengths in
DuckDB; the Pandas-UDF feature path is covered rows-only via q42 and
exactly in tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, pack_media
from ..tables import table
from .queries import _r, register


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return pack_media(
        docs, id_col="doc_id", payload_col=F.encode("text", "UTF-8"), kind="text"
    )


# --------------------------------------------------------------------------
# q41 — binary payload metadata stats (octet lengths survive the
# pack/meta round-trip; JVM-side only).
# --------------------------------------------------------------------------
@register(
    "q41_media_bytes",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS media_count,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           floor(CAST(sum(octet_length(encode(text))) AS DOUBLE) / count(*)
                 * 100 + 0.5) / 100 AS avg_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q41_media_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    media = pack_media(
        docs.select("doc_id", "source", "text"),
        id_col="doc_id",
        payload_col=F.encode("text", "UTF-8"),
        kind="text",
    ).join(docs.select(F.col("doc_id").alias("media_id"), "source"), "media_id")
    return (
        media.groupBy("source")
        .agg(
            F.count("*").alias("media_count"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.max("meta.n_bytes").alias("max_bytes"),
            _r(F.sum("meta.n_bytes").cast("double") / F.count("*"), 2).alias(
                "avg_bytes"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q42 — Pandas-UDF feature extraction (stub decode): per kind, feature
# aggregates. Rows-only driver check (the Arrow batch path has no SQL
# analog); tests/test_multimodal.py pins exact per-payload values.
# --------------------------------------------------------------------------
@register("q42_media_features")
def q42_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media_df(spark, sf_dir), decode_stub=True)
    return feats.agg(
        F.count("*").alias("media_count"),
        F.sum("n_bytes").alias("total_bytes"),
        _r(F.avg("byte_entropy"), 4).alias("avg_entropy"),
        F.countDistinct("head_hash").alias("distinct_head_hashes"),
    )
