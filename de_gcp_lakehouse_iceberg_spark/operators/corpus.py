"""Corpus cleaning pipeline — the composed training-data flow the
extension operators exist for: quality filter → language filter →
exact dedup → near-dup removal. One declarative DataFrame chain;
Catalyst fuses the narrow stages into a single pass over the scan.

Removal policy (deterministic, cross-engine): exact dedup keeps the
lowest doc_id per identical text; near-dup removal drops every doc that
appears as the HIGHER id of a qualifying Jaccard pair (so a chain
a<b<c with pairs (a,b),(b,c) keeps only `a`). The same policy is
expressible in SQL, which is what makes the whole pipeline
oracle-checkable end-to-end (q44).

Scale posture: stages are ordered cheapest-first so each shuffle sees
fewer rows — quality/language are scan-time filters, exact dedup is one
hash shuffle, and only the survivors pay the shingle-join (or its LSH
replacement via `use_lsh=True`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import quality_score
from .dedup import minhash_lsh_pairs, ngram_jaccard_pairs


def clean_corpus(
    docs: DataFrame,
    quality_threshold: float = 0.7,
    langs: list[str] | None = None,
    jaccard_threshold: float = 0.5,
    use_lsh: bool = False,
) -> DataFrame:
    """Returns the cleaned corpus (same columns as input)."""
    kept = docs.withColumn("_q", quality_score("text")).filter(
        F.col("_q") >= quality_threshold
    )
    if langs:
        kept = kept.filter(F.col("lang").isin(langs))
    # exact dedup: lowest doc_id wins per identical text
    w = W.partitionBy("text").orderBy(F.col("doc_id").asc())
    kept = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_q")
    )
    # near-dup removal on the survivors: drop the higher id of each pair
    pair_fn = minhash_lsh_pairs if use_lsh else ngram_jaccard_pairs
    pairs = pair_fn(kept, threshold=jaccard_threshold)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return kept.join(losers, "doc_id", "left_anti")
