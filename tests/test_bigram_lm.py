"""Interpolated bigram LM scoring (operators/corpus.bigram_doc_scores):
hand-checked probabilities on a tiny corpus, plus ordering sanity —
formulaic text outscores rare-transition soup."""

from __future__ import annotations

import math

from de_gcp_lakehouse_iceberg_spark.operators.corpus import bigram_doc_scores


def test_hand_computed_two_doc_corpus(spark):
    # corpus: "a b" x3 and "a c" x1, one language.
    # heads: c(a)=4; bigrams: c(a,b)=3, c(a,c)=1
    # unigrams: N=8, c(b)=3, c(c)=1
    docs = spark.createDataFrame(
        [(i, "en", "a b") for i in range(3)] + [(3, "en", "a c")],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bigram_doc_scores(docs, lam=0.75).collect()
    }
    def q6(x):
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    exp_ab = q6(math.log2(0.75 * (3 / 4) + 0.25 * (3 / 8)))
    exp_ac = q6(math.log2(0.75 * (1 / 4) + 0.25 * (1 / 8)))
    assert out[0]["n_bigrams"] == 1
    assert out[0]["score"] == q6(exp_ab)
    assert out[3]["score"] == q6(exp_ac)
    assert out[0]["score"] > out[3]["score"]  # common transition wins


def test_single_token_docs_are_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "en", "hello"), (1, "en", "hello world")],
        "doc_id long, lang string, text string",
    )
    rows = bigram_doc_scores(docs).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_languages_are_independent_models(spark):
    # same surface text in two langs must be scored by per-lang counts
    docs = spark.createDataFrame(
        [(0, "en", "x y"), (1, "en", "x y"), (2, "de", "x y"),
         (3, "en", "x z")],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r["score"] for r in bigram_doc_scores(docs).collect()}
    # de corpus: only "x y" → p = 0.75*1 + 0.25*(1/2) = 0.875
    # en corpus: c(x,y)=2, c(x)=3, c(y)=2, N=6
    assert out[2] > out[0]
    import math
    assert round(out[2], 6) == round(
        math.floor(math.log2(0.875) * 1e6 + 0.5) / 1e6, 6
    )
