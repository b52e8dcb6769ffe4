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
# q42 — Pandas-UDF feature extraction (stub decode): corpus-level feature
# aggregates. FULL oracle: the stub features are pure byte arithmetic, so
# DuckDB recomputes them from hex(encode(text)) — per-byte extraction via
# substring/strpos, entropy as a byte-value-ordered list_sum fold (the
# Python side folds in the same order → bit-identical doubles), and the
# FNV-1a head hash as a HUGEINT list_reduce mod 2^64. Per-doc entropy is
# quantized to 6dp then decimal-summed so the corpus average is exact and
# order-independent in both engines.
# --------------------------------------------------------------------------
_Q42_ORACLE = """
    WITH hx AS (
      SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id, n, i,
             (strpos('0123456789ABCDEF', substring(h, 2*i+1, 1)) - 1) * 16 +
             (strpos('0123456789ABCDEF', substring(h, 2*i+2, 1)) - 1) AS b
      FROM hx, unnest(range(n)) AS t(i)
    ),
    counts AS (
      SELECT doc_id, n, b, CAST(count(*) AS BIGINT) AS c
      FROM bytes GROUP BY doc_id, n, b
    ),
    ent AS (
      SELECT doc_id,
             floor(-list_sum(list((CAST(c AS DOUBLE)/n) * log2(CAST(c AS DOUBLE)/n)
                                  ORDER BY b))
                   * 1000000 + 0.5) / 1000000 AS ent_q
      FROM counts GROUP BY doc_id
    ),
    fnv AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(14695981039346656037 AS HUGEINT),
                            list(CAST(b AS HUGEINT) ORDER BY i)
                              FILTER (WHERE i < 64)),
               (acc, x) -> ((acc - (acc % 256)
                             + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
                            * 1099511628211)
                           % CAST('18446744073709551616' AS HUGEINT)
             ) AS hh
      FROM bytes GROUP BY doc_id
    ),
    per_doc AS (
      SELECT hx.doc_id, hx.n,
             coalesce(ent.ent_q, 0.0) AS ent_q,
             coalesce(fnv.hh, CAST(14695981039346656037 AS HUGEINT)) AS hh
      FROM hx
      LEFT JOIN ent ON hx.doc_id = ent.doc_id
      LEFT JOIN fnv ON hx.doc_id = fnv.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS media_count,
           CAST(sum(n) AS BIGINT) AS total_bytes,
           floor(CAST(sum(CAST(ent_q AS DECIMAL(28,6))) AS DOUBLE) / count(*)
                 * 10000 + 0.5) / 10000 AS avg_entropy,
           CAST(count(DISTINCT hh) AS BIGINT) AS distinct_head_hashes
    FROM per_doc
"""


@register("q42_media_features", oracle=_Q42_ORACLE)
def q42_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media_df(spark, sf_dir), decode_stub=True)
    ent_q = _r(F.col("byte_entropy"), 6)
    return feats.agg(
        F.count("*").alias("media_count"),
        F.sum("n_bytes").alias("total_bytes"),
        _r(
            F.sum(ent_q.cast("decimal(28,6)")).cast("double") / F.count("*"), 4
        ).alias("avg_entropy"),
        F.countDistinct("head_hash").alias("distinct_head_hashes"),
    )
