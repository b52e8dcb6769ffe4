"""q93 — interpolated bigram LM quality scoring, hash-gated.

The fidelity step from q86's unigram stand-in toward CCNet's KenLM
perplexity filter (operators/corpus.bigram_doc_scores): per-language
bigram + head + unigram tables from the corpus itself, per-transition
log2(λ·p_bigram + (1−λ)·p_unigram) quantized to 6dp, exact decimal
per-doc means, per-language rollup. λ = 0.75 is binary-exact so the
interpolation arithmetic is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import bigram_doc_scores
from ..tables import table
from .queries import register

_LAM = 0.75
_LOW = -5.0


@register(
    "q93_bigram_lm_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_slice(t, 1, len(t) - 1)) AS p,
             unnest(list_slice(t, 2, len(t))) AS c
      FROM toks WHERE len(t) >= 2),
    u AS (SELECT lang, unnest(t) AS tok FROM toks),
    uc AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS cu
           FROM u GROUP BY lang, tok),
    un AS (SELECT lang, sum(cu) AS n FROM uc GROUP BY lang),
    bgc AS (SELECT lang, p, c, CAST(count(*) AS BIGINT) AS cb
            FROM bg GROUP BY lang, p, c),
    hc AS (SELECT lang, p, CAST(count(*) AS BIGINT) AS ch
           FROM bg GROUP BY lang, p),
    lp AS (
      SELECT bgc.lang, bgc.p, bgc.c,
             floor(log2({_LAM} * (CAST(cb AS DOUBLE) / ch)
                        + {1.0 - _LAM} * (CAST(cu AS DOUBLE) / n))
                   * 1000000 + 0.5) / 1000000 AS lp_q
      FROM bgc
      JOIN hc ON bgc.lang = hc.lang AND bgc.p = hc.p
      JOIN uc ON bgc.lang = uc.lang AND bgc.c = uc.tok
      JOIN un ON bgc.lang = un.lang),
    per_doc AS (
      SELECT bg.doc_id, bg.lang,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             floor(CAST(sum(CAST(lp_q AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*) * 1000000 + 0.5) / 1000000 AS score
      FROM bg JOIN lp
        ON bg.lang = lp.lang AND bg.p = lp.p AND bg.c = lp.c
      GROUP BY bg.doc_id, bg.lang)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS n_transitions,
           floor(CAST(sum(CAST(score AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS avg_score,
           min(score) AS worst_score,
           CAST(count(*) FILTER (WHERE score < {_LOW}) AS BIGINT)
             AS n_low_quality
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def q93_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = bigram_doc_scores(docs, lam=_LAM)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("n_transitions"),
            (
                F.floor(
                    F.sum(F.col("score").cast("decimal(28,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 10_000
                    + F.lit(0.5)
                )
                / 10_000
            ).alias("avg_score"),
            F.min("score").alias("worst_score"),
            F.count_if(F.col("score") < _LOW).alias("n_low_quality"),
        )
        .orderBy("lang")
    )
