"""q105 — TF-IDF top terms per document (per-language IDF).

The classic text-analysis primitive the reference's corpus queries stop
short of (its quality surface is counts/ratios — PRD corpus Q-series):
score every (doc, term) by tf · idf where idf is computed within the
doc's language, and keep the 3 most distinctive terms per document.

Spark-first shape: ONE corpus-scale shuffle builds the (lang, term)
document-frequency table; per-doc tf is a map-side-combinable count on
(doc_id, term); idf joins back on the term key; the per-doc top-3 runs
through `operators.topk.grouped_topk` (two-phase partial top-k — no
Window, bounded state per group), the same bounded-state kernel gated
by q85/q94. At 100 TB the df table is vocabulary-sized (≪ corpus) and
every aggregate combines map-side.

Cross-engine determinism (the DuckDB oracle hash-matches): tf and df
are exact longs; idf = log2((N+1)/(df+1)) quantized to 6dp (the same
quantize-after-log pattern as the q86/q93 LM scores, which removes
libm ulp skew); score = tf · idf is a single IEEE multiply, rounded to
4dp with the shared portable `_r` convention.

Reference parity note: extends scripts/verify_loaded_data.sql's
frequency analyses (counts per group) to ranked per-entity relevance —
a capability the reference expresses with BigQuery ML / manual SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.topk import grouped_topk
from ..tables import table
from .queries import _r, register

_K = 3  # top terms kept per document


@register(
    "q105_tfidf_terms",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents),
    tf AS (
      SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS tf
      FROM occ GROUP BY doc_id, lang, w),
    ndocs AS (
      SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n
      FROM documents GROUP BY lang),
    df AS (
      SELECT lang, w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM occ GROUP BY lang, w),
    idf AS (
      SELECT df.lang, df.w,
             floor(log2(CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))
                   * 1000000 + 0.5) / 1000000 AS idf
      FROM df JOIN ndocs USING (lang)),
    scored AS (
      SELECT tf.doc_id, tf.lang, tf.w, tf.tf, tf.tf * idf.idf AS score
      FROM tf JOIN idf ON tf.lang = idf.lang AND tf.w = idf.w),
    ranked AS (
      SELECT doc_id, lang, w, tf, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, w ASC) AS rank
      FROM scored)
    SELECT doc_id, lang, CAST(rank AS INT) AS rank, w AS term, tf,
           floor(score * 10000 + 0.5) / 10000 AS tfidf
    FROM ranked
    WHERE rank <= {_K} AND doc_id % 25 = 0
    ORDER BY doc_id, rank
    """,
)
def q105_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("w")
    )
    tf = occ.groupBy("doc_id", "lang", "w").agg(F.count("*").alias("tf"))
    ndocs = docs.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n")
    )
    df = occ.groupBy("lang", "w").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = df.join(F.broadcast(ndocs), "lang").select(
        "lang",
        "w",
        (
            F.floor(
                F.log2(
                    (F.col("n") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                )
                * 1_000_000
                + F.lit(0.5)
            )
            / 1_000_000
        ).alias("idf"),
    )
    scored = tf.join(idf, ["lang", "w"]).select(
        "doc_id",
        "lang",
        "w",
        "tf",
        (F.col("tf") * F.col("idf")).alias("score"),
    )
    top = grouped_topk(
        scored,
        ["doc_id"],
        [(-F.col("score")).alias("negscore"), F.col("w")],
        _K,
    )
    return (
        top.filter(F.col("doc_id") % 25 == 0)
        .select(
            "doc_id",
            "lang",
            F.col("rank").cast("int").alias("rank"),
            F.col("w").alias("term"),
            "tf",
            _r(F.col("score"), 4).alias("tfidf"),
        )
        .orderBy("doc_id", "rank")
    )
