"""q110 — BPE segmentation rollup: learn the 8-merge vocabulary
(q106's pipeline), then SEGMENT the whole corpus with it and roll up
per-language compression — the inference half of the tokenizer
lifecycle (q106 gates learning; this gates application).

The DuckDB oracle re-learns the merges with the same unrolled CTE
chain, applies them to every document with the same marker-wrapped
`replace()` cascade (greedy left-to-right — word boundaries intact
because only non-space chars are wrapped), and counts tokens from the
rewritten strings. Everything is exact integers.

Scale: `bpe_apply` is a chain of n_merges codegen `replace()`
projections over the scan — no UDF, no shuffle; the rollup is one
map-side-combinable aggregate on lang.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import bpe_apply, bpe_learn
from ..tables import table
from .bpe_query import _N_MERGES, _oracle
from .queries import _r, register


def _apply_oracle(n: int) -> str:
    # reuse q106's WITH-chain (words/seq0..seqN/best0..bestN-1), then
    # segment the raw documents with the same learned merges
    learn = _oracle(n)
    with_part = learn[: learn.rindex("\nSELECT")]
    m2, m3 = "chr(2)", "chr(3)"
    seg = f"regexp_replace(text, '([^ ])', {m2}||'\\1'||{m3}, 'g')"
    for k in range(n):
        seg = (
            f"replace({seg},"
            f" (SELECT {m2}||lhs||{m3}||{m2}||rhs||{m3} FROM best{k}),"
            f" (SELECT {m2}||lhs||rhs||{m3} FROM best{k}))"
        )
    return f"""{with_part},
    segged AS MATERIALIZED (
      SELECT lang,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
             CAST(length(s) - length(replace(s, {m2}, '')) AS BIGINT)
               AS toks
      FROM (SELECT lang, text, {seg} AS s FROM documents) d)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(chars) AS BIGINT) AS char_tokens,
           CAST(sum(toks) AS BIGINT) AS bpe_tokens,
           floor(CAST(sum(chars) AS DOUBLE) / sum(toks) * 10000 + 0.5)
             / 10000 AS compression
    FROM segged
    GROUP BY lang
    ORDER BY lang
    """


@register("q110_bpe_segment_rollup", oracle=_apply_oracle(_N_MERGES))
def q110_bpe_segment_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    learned = bpe_learn(spark, docs, "text", n_merges=_N_MERGES)
    merges = [(r["lhs"], r["rhs"]) for r in learned.collect()]
    toks = bpe_apply("text", merges)
    return (
        docs.select(
            "lang",
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            .cast("long")
            .alias("chars"),
            F.size(toks).cast("long").alias("toks"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("chars").alias("char_tokens"),
            F.sum("toks").alias("bpe_tokens"),
            _r(
                F.sum("chars").cast("double") / F.sum("toks"), 4
            ).alias("compression"),
        )
        .orderBy("lang")
    )
