"""q113 — BM25 ranked retrieval FROM THE STORED INDEX: identical
output to q107, but every corpus-wide statistic (per-term df, per-lang
N, avgdl) comes from the incrementally-built `TermStatsIndex`
(q112's three-batch WAP ingest) instead of re-aggregating the corpus.

Same oracle as q107 — hash-green here proves stored-incremental
statistics drive the EXACT ranking a from-scratch computation
produces (the q88/q90 shared-oracle pattern applied to retrieval).
Per-doc features (tf, dl) still come from the documents being scored —
that's the scorer's input, not corpus state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..lakehouse.term_index import TermStatsIndex
from ..operators.topk import grouped_topk
from ..tables import table
from .bm25_query import _K, _TERMS, _oracle, _spark_score
from .queries import _r, register
from .workdir import scratch


@register("q113_bm25_from_index", oracle=_oracle())
def q113_bm25_from_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    docs = table(spark, sf_dir, "documents")
    root = os.path.join(
        scratch("lakehouse_bm25_index"),
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(root, ignore_errors=True)
    idx = TermStatsIndex.create(spark, root)
    for k in range(3):
        idx.ingest(docs.filter(F.col("doc_id") % 3 == k))

    # corpus-wide stats: STORED deltas only. q107's idf and avgdl are
    # both corpus-global, so collapse the index's per-lang rollups:
    # a doc has exactly one lang, so summing per-lang df / n_docs /
    # sum_len over langs reproduces the global integers exactly.
    ls = idx.lang_stats().agg(
        F.sum("n_docs").alias("n"), F.sum("sum_len").alias("sum_len")
    )
    ts = (
        idx.term_stats()
        .filter(F.col("term").isin(_TERMS))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )
    idf = ts.crossJoin(F.broadcast(ls)).select(
        "term",
        (
            F.floor(
                F.log2(
                    1
                    + (F.col("n").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * 1_000_000
                + F.lit(0.5)
            )
            / 1_000_000
        ).alias("idf"),
    )
    idf_row = idf.groupBy().pivot("term", _TERMS).agg(F.first("idf"))
    # A query term ABSENT from the stored index pivots to NULL, which
    # would null every bm25 score; the direct path (q107) scores a
    # missing term with the finite df=0 idf — coalesce to that value so
    # both paths agree exactly where the shared oracle can't see it.
    idf_df0 = (
        F.floor(
            F.log2(1 + (F.col("n").cast("double") + 0.5) / 0.5)
            * 1_000_000
            + F.lit(0.5)
        )
        / 1_000_000
    )
    idf_row = idf_row.crossJoin(F.broadcast(ls)).select(
        *[F.coalesce(F.col(t), idf_df0).alias(f"idf_{t}") for t in _TERMS]
    )
    corpus = ls.select(
        (F.col("sum_len").cast("double") / F.col("n")).alias("avgdl")
    )

    # per-doc features from the scored documents themselves
    occ = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
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
    dls = docs.select("doc_id", "lang", F.size(tokens("text")).alias("dl"))
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
        .crossJoin(F.broadcast(idf_row))
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
