"""Text-analysis query corpus — language ID, quality scoring, token
stats, fingerprinting over the `documents` table (SURVEY.md §7.1 step 10:
large-scale training-data pipeline operators, first-class alongside §2).

Oracle strategy: the SQL is *generated from the same Python constants*
(marker lists, stopwords, hash constants) as the Spark plans, so the two
dialects cannot drift. All per-doc doubles are computed with identical
operation order in both engines (verified bit-identical), and per-group
averages go through exact decimal sums (see queries.py docstring for why
double→decimal casts are tie-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    _FP_BASE,
    _FP_MOD,
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    lang_scores,
    predict_lang,
    quality_score,
    token_count,
    tokens,
    unique_token_ratio,
)
from ..tables import table
from .queries import _dsum, _r, register


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --------------------------------------------------------------------------
# q30 — token counting / lexical stats per language (whitespace + distinct
# token ratio; the "token counting" pillar).
# --------------------------------------------------------------------------
@register(
    "q30_token_stats",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_unique,
             n_chars,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ({_sql_list(STOPWORDS)}))) AS stop_hits
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS doc_count,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           floor(CAST(sum(n_tokens) AS DOUBLE) / count(*) * 100 + 0.5) / 100
             AS avg_tokens,
           floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 100 + 0.5) / 100
             AS avg_chars,
           floor(CAST(sum(CAST(CAST(n_unique AS DOUBLE) / n_tokens
                               AS DECIMAL(24,12))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS avg_unique_ratio,
           CAST(sum(stop_hits) AS BIGINT) AS total_stopword_hits
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def q30_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        "n_chars",
        token_count("text").alias("n_tokens"),
        unique_token_ratio("text").alias("unique_ratio"),
        F.size(F.filter(tokens("text"), lambda w: w.isin(STOPWORDS))).alias(
            "stop_hits"
        ),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_tokens").alias("total_tokens"),
            _r(F.sum("n_tokens").cast("double") / F.count("*"), 2).alias(
                "avg_tokens"
            ),
            _r(F.sum("n_chars").cast("double") / F.count("*"), 2).alias(
                "avg_chars"
            ),
            _r(
                _dsum("unique_ratio", scale=12, prec=24) / F.count("*"), 4
            ).alias("avg_unique_ratio"),
            F.sum("stop_hits").alias("total_stopword_hits"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q31 — document quality scoring per source (the "quality scoring" pillar;
# shape mirrors PRD.md:2759-2775 bounded-component scores).
# --------------------------------------------------------------------------
_QUALITY_SQL_EXPR = f"""(
  0.4 * least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE) / 50.0)
  + 0.3 * (1.0 - CAST(len(list_filter(string_split(text,' '),
                       w -> w IN ({_sql_list(STOPWORDS)}))) AS DOUBLE)
                 / len(string_split(text,' ')))
  + 0.3 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
           / len(string_split(text,' ')))
)"""


@register(
    "q31_quality_score",
    oracle=f"""
    WITH scored AS (
      SELECT source, {_QUALITY_SQL_EXPR} AS score FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS doc_count,
           floor(CAST(sum(CAST(score AS DECIMAL(24,12))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS avg_quality,
           CAST(sum(CASE WHEN score < 0.75 THEN 1 ELSE 0 END) AS BIGINT)
             AS low_quality_docs
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def q31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = docs.select("source", quality_score("text").alias("score"))
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            _r(_dsum("score", scale=12, prec=24) / F.count("*"), 4).alias(
                "avg_quality"
            ),
            F.sum(F.when(F.col("score") < 0.75, 1).otherwise(0)).alias(
                "low_quality_docs"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q32 — language identification accuracy (n-gram/marker heuristic vs the
# labeled lang column; the "language-ID" pillar).
# --------------------------------------------------------------------------
def _lang_case_sql() -> str:
    score = {
        lang: f"""len(list_filter(string_split(text,' '),
                 w -> w IN ({_sql_list(markers)})))"""
        for lang, markers in LANG_MARKERS.items()
    }
    greatest = "greatest(" + ", ".join(score[lang] for lang in sorted(score)) + ")"
    whens = "\n".join(
        f"WHEN {score[lang]} = {greatest} THEN '{lang}'" for lang in sorted(score)
    )
    return f"CASE {whens} END"


@register(
    "q32_lang_id",
    oracle=f"""
    WITH predicted AS (
      SELECT lang AS actual_lang, {_lang_case_sql()} AS predicted_lang
      FROM documents
    )
    SELECT actual_lang,
           CAST(count(*) AS BIGINT) AS doc_count,
           CAST(sum(CASE WHEN predicted_lang = actual_lang THEN 1 ELSE 0 END)
                AS BIGINT) AS correct,
           floor(CAST(sum(CASE WHEN predicted_lang = actual_lang THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS accuracy
    FROM predicted
    GROUP BY actual_lang
    ORDER BY actual_lang
    """,
)
def q32_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("actual_lang"),
        predict_lang("text").alias("predicted_lang"),
    )
    correct = F.sum(
        F.when(F.col("predicted_lang") == F.col("actual_lang"), 1).otherwise(0)
    )
    return (
        pred.groupBy("actual_lang")
        .agg(
            F.count("*").alias("doc_count"),
            correct.alias("correct"),
            _r(correct.cast("double") / F.count("*"), 4).alias("accuracy"),
        )
        .orderBy("actual_lang")
    )


# --------------------------------------------------------------------------
# q33 — document fingerprinting (rolling hash) per source: fingerprint
# collisions are the cheap first-pass dedup signal.
# --------------------------------------------------------------------------
@register(
    "q33_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT source,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text,' '),
                   w -> CAST(length(w) * 31 + ascii(w) AS BIGINT))),
               (acc, x) -> (acc * {_FP_BASE} + x) % {_FP_MOD}) AS fp
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS doc_count,
           CAST(count(DISTINCT fp) AS BIGINT) AS distinct_fingerprints,
           CAST(min(fp) AS BIGINT) AS min_fp,
           CAST(max(fp) AS BIGINT) AS max_fp
    FROM fp
    GROUP BY source
    ORDER BY source
    """,
)
def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    fp = docs.select("source", fingerprint("text").alias("fp"))
    return (
        fp.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            F.countDistinct("fp").alias("distinct_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("source")
    )
