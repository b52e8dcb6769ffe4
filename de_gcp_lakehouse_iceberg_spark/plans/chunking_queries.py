"""q61 — overlapping context-window chunking census: every document
split into 64-token windows with stride 48 (16-token overlap); per-lang
census of chunk counts and sizes. The oracle rebuilds the same chunk
arithmetic over DuckDB list slices."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import chunk_text
from ..tables import table
from .queries import _r, register

_CHUNK = 64
_STRIDE = 48


@register(
    "q61_overlap_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    chunks AS (
      SELECT doc_id, lang,
             unnest(range(0, (len(t) - 1) // {_STRIDE} + 1)) AS chunk_idx,
             len(t) AS k
      FROM toks),
    sized AS (
      SELECT doc_id, lang, chunk_idx,
             least({_CHUNK}, k - chunk_idx * {_STRIDE}) AS n_tokens
      FROM chunks)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE n_tokens = {_CHUNK}) AS BIGINT)
             AS full_chunks,
           floor(CAST(sum(n_tokens) AS DOUBLE) / count(*) * 100 + 0.5)
             / 100 AS avg_chunk_tokens
    FROM sized
    GROUP BY lang
    ORDER BY lang
    """,
)
def q61_overlap_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id",
        "lang",
        F.explode(chunk_text("text", _CHUNK, _STRIDE)).alias("c"),
    )
    return (
        exploded.groupBy("lang")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count_if(F.col("c.n_tokens") == _CHUNK).alias("full_chunks"),
            _r(
                F.sum("c.n_tokens").cast("double") / F.count("*"), 2
            ).alias("avg_chunk_tokens"),
        )
        .orderBy("lang")
    )
