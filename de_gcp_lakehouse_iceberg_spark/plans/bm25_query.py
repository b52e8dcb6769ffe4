"""q107 — BM25 ranked retrieval over the documents corpus: score every
document against a fixed query-term set with Okapi BM25 (Lucene's
non-negative idf variant), return the top 10 per language.

The retrieval primitive of a corpus platform (quality-weighted search,
eval-set mining, hard-negative mining for embedding training) kept
entirely declarative: one exploded-token aggregate builds per-doc term
frequencies for the query terms, corpus stats (N, avgdl, per-term df)
reduce to ONE broadcast row, scoring is a fixed-shape arithmetic
expression, and the per-language top-10 runs through the bounded-state
`grouped_topk` kernel (no Window over the corpus). At 100 TB the only
corpus-scale work is the token scan + one map-side-combinable agg on
doc_id.

Cross-engine determinism: tf/df/doclen are exact longs; idf is
6dp-quantized after log2 (the q86/q93 convention); the score is a
FIXED parenthesized expression tree — per-term scores summed in
written order, never a SUM() over rows whose order an engine picks —
so Spark and DuckDB execute the identical IEEE op sequence. k1 = 1.2,
b = 0.75 (0.25/0.75 dyadic-exact; fl(1.2)/fl(2.2) identical in both
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.topk import grouped_topk
from ..tables import table
from .queries import _r, register

_TERMS = ["merge", "scan", "sort", "window"]
_K = 10  # docs kept per language


def _spark_score(term: str):
    """idf_t * (tf_t·(k1+1)) / (tf_t + k1·(1 − b + b·dl/avgdl)),
    written as one fixed expression tree."""
    tf = F.col(f"tf_{term}").cast("double")
    norm = F.lit(0.25) + F.lit(0.75) * (
        F.col("dl").cast("double") / F.col("avgdl")
    )
    return F.col(f"idf_{term}") * (
        (tf * F.lit(2.2)) / (tf + F.lit(1.2) * norm)
    )


def _oracle() -> str:
    tf_cols = ",\n             ".join(
        f"CAST(sum(CASE WHEN w = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS tf_{t}"
        for t in _TERMS
    )
    df_cols = ",\n             ".join(
        f"CAST(count(DISTINCT doc_id)"
        f" FILTER (WHERE w = '{t}') AS BIGINT) AS df_{t}"
        for t in _TERMS
    )
    idf_cols = ",\n             ".join(
        f"floor(log2(1 + (CAST(n AS DOUBLE) - df_{t} + 0.5)"
        f" / (df_{t} + 0.5)) * 1000000 + 0.5) / 1000000 AS idf_{t}"
        for t in _TERMS
    )
    score_terms = [
        f"(idf_{t} * ((CAST(tf_{t} AS DOUBLE) * 2.2)"
        f" / (CAST(tf_{t} AS DOUBLE) + 1.2 *"
        f" (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))))"
        for t in _TERMS
    ]
    # fixed left-to-right association, matching the Spark side
    score = score_terms[0]
    for s in score_terms[1:]:
        score = f"({score} + {s})"
    return f"""
    WITH occ AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents),
    dls AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents),
    tf AS (
      SELECT doc_id,
             {tf_cols}
      FROM occ WHERE w IN ({", ".join(f"'{t}'" for t in _TERMS)})
      GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n,
             {df_cols}
      FROM occ),
    corpus AS (
      SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dls),
    idf AS (
      SELECT n,
             {idf_cols}
      FROM stats),
    filled AS (
      SELECT d.doc_id, d.lang, d.dl,
             {", ".join(f"COALESCE(tf_{t}, 0) AS tf_{t}" for t in _TERMS)}
      FROM dls d LEFT JOIN tf USING (doc_id)),
    fixed AS (
      SELECT doc_id, lang, dl,
             floor(({score}) * 10000 + 0.5) / 10000 AS bm25
      FROM filled, idf, corpus),
    ranked AS (
      SELECT lang, doc_id, dl, bm25,
             row_number() OVER (PARTITION BY lang
                                ORDER BY bm25 DESC, doc_id) AS rank
      FROM fixed)
    SELECT lang, CAST(rank AS INT) AS rank, doc_id, dl, bm25
    FROM ranked WHERE rank <= {_K}
    ORDER BY lang, rank
    """


@register("q107_bm25_topk", oracle=_oracle())
def q107_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    dls = docs.select(
        "doc_id", "lang", F.size(tokens("text")).alias("dl")
    )
    tf = (
        occ.filter(F.col("w").isin(_TERMS))
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("w") == t, 1).otherwise(0)).alias(
                    f"tf_{t}"
                )
                for t in _TERMS
            ]
        )
    )
    stats = occ.agg(
        F.countDistinct("doc_id").alias("n"),
        *[
            F.countDistinct(
                F.when(F.col("w") == t, F.col("doc_id"))
            ).alias(f"df_{t}")
            for t in _TERMS
        ],
    )
    idf = stats.select(
        *[
            (
                F.floor(
                    F.log2(
                        1
                        + (F.col("n").cast("double") - F.col(f"df_{t}") + 0.5)
                        / (F.col(f"df_{t}") + 0.5)
                    )
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias(f"idf_{t}")
            for t in _TERMS
        ]
    )
    corpus = dls.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl")
    )
    joined = (
        dls.join(tf, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "dl",
            *[
                F.coalesce(F.col(f"tf_{t}"), F.lit(0)).alias(f"tf_{t}")
                for t in _TERMS
            ],
        )
        .crossJoin(F.broadcast(idf))
        .crossJoin(F.broadcast(corpus))
    )
    score = _spark_score(_TERMS[0])
    for t in _TERMS[1:]:
        score = score + _spark_score(t)
    scored = joined.select(
        "lang", "doc_id", "dl", _r(score, 4).alias("bm25")
    )
    top = grouped_topk(
        scored,
        ["lang"],
        [(-F.col("bm25")).alias("neg"), F.col("doc_id")],
        _K,
    )
    return top.select(
        "lang",
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        "dl",
        "bm25",
    ).orderBy("lang", "rank")
