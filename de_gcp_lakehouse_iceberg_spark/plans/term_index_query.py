"""q112 — incremental term-statistics index: the corpus is ingested in
THREE batches into a persisted `TermStatsIndex` (WAP exactly-once
appends), and the gate reads per-language BM25 statistics — document
frequency, corpus size, average length, quantized idf — from the
STORED DELTAS alone. The DuckDB oracle recomputes the same statistics
from the final corpus in one pass, so hash-green proves
batched-incremental == from-scratch, bit for bit (every stat is an
exact-integer sum of abelian deltas; idf is the q107 6dp-quantized
formula on those integers).

This is the retrieval analog of q90's signature index: statistics a
scorer needs, maintained under continuous ingestion without O(corpus)
re-aggregation per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse.term_index import TermStatsIndex
from ..tables import table
from .queries import register
from .workdir import scratch

_TERMS = ["merge", "scan", "sort", "window"]


@register(
    "q112_incremental_term_stats",
    oracle=f"""
    WITH occ AS (
      SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents),
    df AS (
      SELECT lang, w AS term, CAST(count(*) AS BIGINT) AS df
      FROM occ WHERE w IN ({", ".join(f"'{t}'" for t in _TERMS)})
      GROUP BY lang, w),
    ls AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_len
      FROM documents GROUP BY lang)
    SELECT d.lang, d.term, d.df, l.n_docs, l.sum_len,
           floor(CAST(l.sum_len AS DOUBLE) / l.n_docs * 1000000 + 0.5)
             / 1000000 AS avgdl,
           floor(log2(1 + (CAST(l.n_docs AS DOUBLE) - d.df + 0.5)
                      / (d.df + 0.5)) * 1000000 + 0.5) / 1000000 AS idf
    FROM df d JOIN ls l USING (lang)
    ORDER BY d.lang, d.term
    """,
)
def q112_incremental_term_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    root = os.path.join(
        scratch("lakehouse_term_index"),
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(root, ignore_errors=True)
    idx = TermStatsIndex.create(spark, root)
    # three WAP-exactly-once increments covering the corpus
    idx.ingest(docs.filter(F.col("doc_id") % 3 == 0))
    idx.ingest(docs.filter(F.col("doc_id") % 3 == 1))
    idx.ingest(docs.filter(F.col("doc_id") % 3 == 2))

    ts = idx.term_stats().filter(F.col("term").isin(_TERMS))
    ls = idx.lang_stats()
    return (
        ts.join(ls, "lang")
        .select(
            "lang",
            "term",
            "df",
            "n_docs",
            "sum_len",
            (
                F.floor(
                    F.col("sum_len").cast("double") / F.col("n_docs")
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("avgdl"),
            (
                F.floor(
                    F.log2(
                        1
                        + (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    )
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("idf"),
        )
        .orderBy("lang", "term")
    )
