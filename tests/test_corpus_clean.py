"""Composed corpus-cleaning pipeline: removal-policy semantics on a
crafted corpus, and exact-vs-LSH variant agreement on real data."""

from __future__ import annotations

from de_gcp_lakehouse_iceberg_spark.operators.corpus import clean_corpus
from de_gcp_lakehouse_iceberg_spark.tables import table


def test_chain_removal_keeps_lowest(spark):
    # 1,2,3 are near-identical long docs (chain); 4 unique; 5 duplicates 4's
    # text exactly; 6 is low-quality (tiny)
    long_a = " ".join(f"w{i}" for i in range(60))
    long_b = " ".join(f"w{i}" for i in range(59)) + " x1"
    long_c = " ".join(f"w{i}" for i in range(58)) + " x1 x2"
    uniq = " ".join(f"u{i}" for i in range(60))
    rows = [
        (1, long_a, "en"),
        (2, long_b, "en"),
        (3, long_c, "en"),
        (4, uniq, "en"),
        (5, uniq, "en"),  # exact dup of 4
        (6, "tiny doc", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = sorted(
        r.doc_id
        # 0.7 floor: the long docs score 1.0 (distinct words, no
        # stopwords), "tiny doc" scores ≈0.62 (length part ≈0)
        for r in clean_corpus(
            df, quality_threshold=0.7, langs=["en"], jaccard_threshold=0.5
        ).collect()
    )
    # 5 removed by exact dedup, 2 & 3 by near-dup (higher ids), 6 by quality
    assert kept == [1, 4]


def test_lsh_variant_matches_exact_on_corpus(spark, sf_dir_medium):
    docs = table(spark, sf_dir_medium, "documents")
    exact = {
        r.doc_id
        for r in clean_corpus(docs, use_lsh=False).select("doc_id").collect()
    }
    lsh = {
        r.doc_id
        for r in clean_corpus(docs, use_lsh=True).select("doc_id").collect()
    }
    assert exact == lsh  # LSH recall is total at the planted similarity
    assert 0 < len(exact) < docs.count()
