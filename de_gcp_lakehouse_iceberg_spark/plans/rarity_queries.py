"""q62 — corpus-statistics token-rarity scoring: a CCNet-style
statistical quality filter with every cross-row aggregate kept in
exact integer arithmetic so the DuckDB oracle hash-matches.

Each document's score is the mean corpus document-frequency of its
tokens: sum over token OCCURRENCES of the token's total corpus count,
divided by the doc's token count. Low mean frequency = rare/unusual
vocabulary (candidate noise or specialist text); high = common filler.
The numerator is a SUM OF LONGS (order-independent, exact — this is
what makes the operator hash-checkable; a -log unigram perplexity
would accumulate libm ulp drift across engines), and the only double
division happens once per doc on exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..tables import table
from .queries import _r, register

_RARE_T = 2000.0  # mean corpus token-count below this = "rare" doc


@register(
    "q62_token_rarity",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      FROM documents),
    freq AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY w),
    scored AS (
      SELECT o.doc_id, o.source,
             CAST(sum(f.c) AS DOUBLE) / count(*) AS mean_freq
      FROM occ o JOIN freq f ON o.w = f.w
      GROUP BY o.doc_id, o.source)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE mean_freq < {_RARE_T}) AS BIGINT)
             AS rare_docs,
           floor(CAST(sum(mean_freq) AS DOUBLE) / count(*) * 100 + 0.5)
             / 100 AS avg_mean_freq
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def q62_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", "source", F.explode(tokens("text")).alias("w")
    )
    freq = occ.groupBy("w").agg(F.count("*").alias("c"))
    scored = (
        occ.join(freq, "w")
        .groupBy("doc_id", "source")
        .agg(
            (F.sum("c").cast("double") / F.count("*")).alias("mean_freq")
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("mean_freq") < _RARE_T).alias("rare_docs"),
            _r(F.sum("mean_freq") / F.count("*"), 2).alias("avg_mean_freq"),
        )
        .orderBy("source")
    )
