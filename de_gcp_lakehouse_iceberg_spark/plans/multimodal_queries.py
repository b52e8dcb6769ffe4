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
# q42 — Pandas-UDF feature extraction WITH the real header decode:
# corpus-level feature aggregates. FULL oracle: the byte features are pure
# byte arithmetic, so DuckDB recomputes them from hex(encode(text)) —
# per-byte extraction via substring/strpos, entropy as a byte-value-ordered
# list_sum fold (the Python side folds in the same order → bit-identical
# doubles), and the FNV-1a head hash as a HUGEINT list_reduce mod 2^64.
# Per-doc entropy is quantized to 6dp then decimal-summed so the corpus
# average is exact and order-independent in both engines.
#
# The header PARSER is gated by planting, per document, a synthetic PNG
# (IHDR width/height from doc_id formulas, built byte-by-byte with
# unhex/concat) and a minimal JPEG (SOF0 segment) — the engine parses the
# actual bytes back out of the binary payloads; the oracle states the
# planted formulas. A parser that misreads endianness, offsets, or marker
# walk breaks the hash.
# --------------------------------------------------------------------------
_PNG_W = "100 + doc_id % 37"
_PNG_H = "50 + doc_id % 23"
_JPG_W = "64 + doc_id % 100"
_JPG_H = "32 + doc_id % 50"
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
           CAST(count(DISTINCT hh) AS BIGINT) AS distinct_head_hashes,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS png_decoded,
           CAST((SELECT sum({png_w}) FROM documents) AS BIGINT) AS png_w_sum,
           CAST((SELECT sum({png_h}) FROM documents) AS BIGINT) AS png_h_sum,
           CAST((SELECT count(*) FROM documents) AS BIGINT) AS jpg_decoded,
           CAST((SELECT sum({jpg_w}) FROM documents) AS BIGINT) AS jpg_w_sum,
           CAST((SELECT sum({jpg_h}) FROM documents) AS BIGINT) AS jpg_h_sum
    FROM per_doc
""".format(png_w=_PNG_W, png_h=_PNG_H, jpg_w=_JPG_W, jpg_h=_JPG_H)


def _planted_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc synthetic PNG + JPEG payloads with doc_id-derived
    dimensions, built byte-exactly with unhex/concat (JVM-side)."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    hx = lambda e, n: F.unhex(F.lpad(F.hex(F.expr(e)), n, "0"))  # noqa: E731
    png = docs.select(
        "doc_id",
        F.lit("png").alias("kind"),
        F.concat(
            # signature + IHDR length(13) + "IHDR"
            F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")),
            hx(_PNG_W, 8),  # width,  big-endian uint32
            hx(_PNG_H, 8),  # height, big-endian uint32
            # bit depth 8, color type 2, compression/filter/interlace 0,
            # CRC placeholder (header parse does not validate CRCs)
            F.unhex(F.lit("08020000001C0D6A24")),
        ).alias("payload"),
    )
    jpg = docs.select(
        "doc_id",
        F.lit("jpeg").alias("kind"),
        F.concat(
            # SOI + SOF0 marker + segment length 17 + precision 8
            F.unhex(F.lit("FFD8FFC0001108")),
            hx(_JPG_H, 4),  # height, big-endian uint16 (before width!)
            hx(_JPG_W, 4),
            # 3 components (id, sampling, qtable) + EOI
            F.unhex(F.lit("03011100021101031101FFD9")),
        ).alias("payload"),
    )
    return png.unionByName(jpg)


@register("q42_media_features", oracle=_Q42_ORACLE)
def q42_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    text_media = _media_df(spark, sf_dir)
    # pack_media fixes one kind per call → pack png/jpeg separately
    imgs = _planted_images(spark, sf_dir)
    png_media = pack_media(
        imgs.filter(F.col("kind") == "png"), "doc_id", F.col("payload"), "png"
    )
    jpg_media = pack_media(
        imgs.filter(F.col("kind") == "jpeg"), "doc_id", F.col("payload"), "jpeg"
    )
    media = text_media.unionByName(png_media).unionByName(jpg_media)
    feats = extract_features(media, decode_stub=False)
    ent_q = _r(F.col("byte_entropy"), 6)
    is_text = F.col("kind") == "text"
    return feats.agg(
        F.count_if(is_text).alias("media_count"),
        F.sum(F.when(is_text, F.col("n_bytes"))).alias("total_bytes"),
        _r(
            F.sum(F.when(is_text, ent_q.cast("decimal(28,6)"))).cast("double")
            / F.count_if(is_text),
            4,
        ).alias("avg_entropy"),
        F.count_distinct(F.when(is_text, F.col("head_hash"))).alias(
            "distinct_head_hashes"
        ),
        F.count_if(F.col("format") == "png").alias("png_decoded"),
        F.sum(F.when(F.col("format") == "png", F.col("width"))).alias(
            "png_w_sum"
        ),
        F.sum(F.when(F.col("format") == "png", F.col("height"))).alias(
            "png_h_sum"
        ),
        F.count_if(F.col("format") == "jpeg").alias("jpg_decoded"),
        F.sum(F.when(F.col("format") == "jpeg", F.col("width"))).alias(
            "jpg_w_sum"
        ),
        F.sum(F.when(F.col("format") == "jpeg", F.col("height"))).alias(
            "jpg_h_sum"
        ),
    )
