"""q46 — n-gram Jaccard near-dup with the document-frequency cap (the
scale knob of SURVEY.md §7.3 item 9): shingles present in more than
MAX_DF docs are dropped on BOTH engines before the inverted-index join,
so the capped semantics themselves are oracle-checked — not just the
uncapped baseline (q35)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import ngram_jaccard_pairs
from ..tables import table
from .dedup_queries import _SHINGLE_SQL
from .queries import _r, register

MAX_DF = 10


@register(
    "q46_jaccard_maxdf",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    df_counts AS (
      SELECT s, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY s
    ),
    ex_capped AS (
      SELECT ex.doc_id, ex.s FROM ex
      JOIN df_counts USING (s) WHERE df_counts.df <= {MAX_DF}
    ),
    sizes_c AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n
      FROM ex_capped GROUP BY doc_id
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS common
      FROM ex_capped a JOIN ex_capped b
        ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b)
    SELECT p.doc_a, p.doc_b,
           floor(CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common)
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM pairs p
    JOIN sizes_c sa ON p.doc_a = sa.doc_id
    JOIN sizes_c sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common) >= 0.5
    ORDER BY p.doc_a, p.doc_b
    """,
)
def q46_jaccard_maxdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_df=MAX_DF)
    return pairs.select(
        "doc_a", "doc_b", _r(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("doc_a", "doc_b")
