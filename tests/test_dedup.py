"""Dedup operator semantics: exact dedup winner selection, Jaccard
correctness, SimHash determinism, and the LSH-vs-exact recall gap that
the driver's rows-only check can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators import dedup
from de_gcp_lakehouse_iceberg_spark.tables import table


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (5, "aa"), (3, "aa"), (2, "bb")], "id long, text string"
    )
    out = dedup.exact_dedup(df, ["text"], "id")
    got = {r.text: r.id for r in out.collect()}
    assert got == {"aa": 1, "bb": 2}
    assert out.columns == df.columns  # caller's column order preserved
    # plan shape: an aggregate with map-side partial combine, NO window
    # (the window form shuffled + sorted every row)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan


def test_jaccard_pairs_exact_values(spark):
    # doc 1/2 share 2 of their 3-shingle union; doc 3 is disjoint
    df = spark.createDataFrame(
        [
            (1, "a b c d"),  # shingles: {a b c, b c d}
            (2, "a b c d e"),  # shingles: {a b c, b c d, c d e}
            (3, "x y z"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert abs(r.jaccard - 2 / 3) < 1e-12


def test_short_doc_shingles(spark):
    # doc shorter than n tokens → one full-text shingle, Jaccard defined
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    rows = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_simhash_deterministic_and_identical_for_same_text(spark):
    df = spark.createDataFrame(
        [(1, "spark row hash"), (2, "spark row hash"), (3, "totally different words here")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.sig for r in
            df.select("doc_id", dedup.simhash("text").alias("sig")).collect()}
    assert sigs[1] == sigs[2]
    assert 0 <= sigs[1] < 2**16
    # stable across invocations (pure function of text)
    sigs2 = {r.doc_id: r.sig for r in
             df.select("doc_id", dedup.simhash("text").alias("sig")).collect()}
    assert sigs == sigs2


def test_lsh_pairs_equal_exact_pairs(spark, sf_dir_medium):
    docs = table(spark, sf_dir_medium, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            docs, num_hashes=64, bands=32, threshold=0.5
        ).collect()
    }
    assert exact  # the corpus plants near-dup pairs — guard against vacuity
    assert lsh == exact


def test_max_df_cap_drops_ubiquitous_shingles(spark):
    # shingle "a b c" appears in 3 docs; cap at 2 removes it everywhere
    df = spark.createDataFrame(
        [(1, "a b c x"), (2, "a b c y"), (3, "a b c z")],
        "doc_id long, text string",
    )
    uncapped = dedup.doc_shingles(df)
    capped = dedup.doc_shingles(df, max_df=2)
    assert uncapped.filter(F.col("shingle") == "a b c").count() == 3
    assert capped.filter(F.col("shingle") == "a b c").count() == 0


def test_simhash_fast_equals_expression_form_on_10x_corpus(spark, sf_dir_medium):
    """The vectorized pandas_udf SimHash must equal the Catalyst
    expression form bit-for-bit (all-integer math) — checked on a 10×
    replicated corpus with perturbed texts so the vectorized path sees
    real batch sizes, unicode, and varied token counts."""
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir_medium, "documents")
    big = docs.crossJoin(spark.range(10).select(F.col("id").alias("rep"))).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
        # vary the text per replica so signatures differ across reps
        F.concat_ws(" ", F.col("text"), F.col("rep").cast("string")).alias("text"),
    )
    import time

    both = big.select(
        "doc_id",
        dedup.simhash("text").alias("expr_sig"),
        dedup.simhash_fast("text").alias("fast_sig"),
    )
    t0 = time.time()
    mismatches = both.filter(F.col("expr_sig") != F.col("fast_sig")).count()
    assert mismatches == 0
    # and a rough CPU sanity probe: fast path alone over the 10x corpus
    t1 = time.time()
    big.select(dedup.simhash_fast("text").alias("s")).agg(
        F.count("*"), F.sum("s")
    ).collect()
    fast_wall = time.time() - t1
    print(f"simhash 10x: joint={t1-t0:.2f}s fast-only={fast_wall:.2f}s")


def test_char_poly_udf_equals_expression(spark):
    """char_poly_key_udf == _char_poly_key on unicode/empty/null input."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("hello",), ("",), (None,), ("héllo wörld",), ("中文 text",)],
        "s string",
    )
    rows = df.select(
        dedup._char_poly_key(F.col("s")).alias("expr"),
        dedup.char_poly_key_udf()(F.col("s")).alias("udf"),
    ).collect()
    for r in rows:
        assert r.expr == r.udf, (r.expr, r.udf)


def test_minhash_portable_mode_matches_exact_jaccard(spark, sf_dir):
    """hash_mode='portable' (the oracle-checkable family) finds the same
    verified pair set as exact n-gram Jaccard, like the default mode."""
    docs = table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.5, hash_mode="portable"
        ).collect()
    }
    assert lsh == exact


def test_minhash_release_mode_same_pairs_and_frees_blocks(spark, sf_dir):
    """release=True returns the identical pair set and leaves no
    corpus-sized blocks pinned (only the output-sized pairs cache)."""
    docs = table(spark, sf_dir, "documents")
    spark.catalog.clearCache()
    kept = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.5, hash_mode="portable", release=True
        ).collect()
    }
    lazy = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.5, hash_mode="portable"
        ).collect()
    }
    assert kept == lazy and kept
    spark.catalog.clearCache()


def test_fast_minhash_sig_equals_expression_form(spark, sf_dir_medium):
    """The fused Arrow fast path (doc_keys_sig_udf: shingle build +
    char-poly keys + numpy signature in one pass) must equal the
    exploded expression-form minhash_signatures bit-for-bit in portable
    mode — all-integer math, so any divergence is a real bug."""
    docs = table(spark, sf_dir_medium, "documents")
    expr_sig = {
        r.doc_id: list(r.signature)
        for r in dedup.minhash_signatures(docs, hash_mode="portable").collect()
    }
    fast = {
        r.doc_id: (list(r.ks.keys), list(r.ks.sig) if r.ks.sig else None)
        for r in docs.select(
            F.col("doc_id"),
            dedup.doc_keys_sig_udf(3, 64)(F.col("text")).alias("ks"),
        ).collect()
    }
    assert set(expr_sig) == {d for d, (k, s) in fast.items() if s is not None}
    for doc_id, sig in expr_sig.items():
        assert fast[doc_id][1] == sig, doc_id
    # keys are sorted distinct char-poly values — spot-check one doc
    # against the exploded path
    some_doc = next(iter(expr_sig))
    exploded = sorted(
        r.k
        for r in dedup.doc_shingles(docs)
        .filter(F.col("doc_id") == some_doc)
        .select(dedup.char_poly_key_udf()(F.col("shingle")).alias("k"))
        .collect()
    )
    assert sorted(set(exploded)) == fast[some_doc][0]


def test_dup_span_stats_interval_union(spark):
    from de_gcp_lakehouse_iceberg_spark.operators.dedup import dup_span_stats

    # doc 1 and doc 2 share the 5-token run "a b c d e" → with n=3,
    # duplicated starts at positions 0,1,2 cover tokens 0..4 (5 tokens,
    # overlapping intervals union — not 3·n=9). doc 3 shares nothing.
    rows = [
        (1, "a b c d e x y z"),
        (2, "q q q a b c d e"),
        (3, "u v w t s r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_tokens, r.covered_tokens)
           for r in dup_span_stats(df, n=3).collect()}
    assert out[1] == (8, 5)
    # doc 2: "q q q" also repeats nothing globally (single occurrence),
    # so only the shared run counts: starts 3,4,5 → tokens 3..7
    assert out[2] == (8, 5)
    assert out[3] == (6, 0)


def test_dup_span_stats_within_doc_repeat(spark):
    from de_gcp_lakehouse_iceberg_spark.operators.dedup import dup_span_stats

    # the trigram "a b c" occurs twice WITHIN one doc → both spans covered
    df = spark.createDataFrame(
        [(1, "a b c z z a b c")], "doc_id long, text string"
    )
    out = dup_span_stats(df, n=3).collect()[0]
    assert (out.n_tokens, out.covered_tokens) == (8, 6)


def test_lsh_probe_pairs_incremental(spark):
    """Asymmetric probe: finds new-vs-corpus near-dups, never reports
    corpus-internal pairs, and xxhash/portable modes agree on the
    verified (exact-Jaccard) pair set."""
    from de_gcp_lakehouse_iceberg_spark.operators.dedup import (
        lsh_probe_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base), (2, base)]                     # internal dup pair!
        + [(i, f"corpus doc {i} " + " ".join(f"w{i}{j}" for j in range(12)))
           for i in range(3, 10)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, base),                              # dup of corpus 1 and 2
         (101, "entirely different words nothing shared here at all ok")],
        "doc_id long, text string",
    )
    for mode in ("xxhash64", "portable"):
        got = sorted(
            (r.new_id, r.corpus_id)
            for r in lsh_probe_pairs(
                new, corpus, threshold=0.5, hash_mode=mode
            ).collect()
        )
        # the corpus-internal (1,2) dup is NOT in the output; both
        # corpus copies match the new doc
        assert got == [(100, 1), (100, 2)], mode


def test_prefix_filtered_jaccard_identical_pairs(spark, sf_dir):
    """prefix_filter=True (AllPairs/PPJoin candidate generation) must
    return the bit-identical pair set as the naive inverted-index
    join — it is a candidate-superset + exact verify, not an
    approximation. Covers the capped (max_df) route too."""
    docs = table(spark, sf_dir, "documents")
    for kw in ({}, {"max_df": 40}, {"threshold": 0.3}):
        plain = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in dedup.ngram_jaccard_pairs(docs, **kw).collect()
        }
        pp = {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in dedup.ngram_jaccard_pairs(
                docs, prefix_filter=True, **kw
            ).collect()
        }
        assert pp == plain and plain, kw


def test_exact_dedup_map_payload_falls_back_to_window(spark):
    """r10 ADVICE: map-typed payload is unorderable — exact_dedup must
    not raise, and must still keep the lowest-order row per key."""
    df = spark.createDataFrame(
        [("x", 2, {"k": 2}), ("x", 1, {"k": 1}), ("y", 9, {"k": 9})],
        "text string, id int, m map<string,int>",
    )
    out = {
        r.text: (r.id, dict(r.m))
        for r in dedup.exact_dedup(df, ["text"], "id").collect()
    }
    assert out == {"x": (1, {"k": 1}), "y": (9, {"k": 9})}


def test_window_keys_match_string_built_shingle_keys():
    """r13 signing rewrite: `_window_keys_batch` composes each shingle
    key from per-token char-poly hashes via exact modular identities —
    the values must be BIT-IDENTICAL to hashing the built shingle
    strings (that is what keeps every portable-hash oracle unchanged).
    Pure-numpy property check across the edge zoo: None, empty text,
    short docs (whole-text fallback), empty tokens from double spaces,
    non-ASCII codepoints, and single-char/long tokens."""
    import random

    import numpy as np

    rng = random.Random(7)
    words = ["apple", "b", "caterpillar", "δelta", "", "x" * 40, "yy"]
    texts: list = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 30)))
        for _ in range(500)
    ]
    texts += [None, "", "one", "one two", "a  b", " ", "  ", "ű ő 語"]

    def built(t: str | None, n: int, dual: bool) -> np.ndarray:
        if t is None:
            return np.empty(0, np.int64)
        toks = t.split(" ")
        sh = [
            " ".join(toks[i : i + n])
            for i in range(max(len(toks) - n, 0) + 1)
        ]
        return (
            dedup._char_poly2_batch(sh)
            if dual
            else dedup._char_poly_batch(sh)
        )

    for n in (2, 3, 5):
        for fams, dual in ((dedup._FAMS1, False), (dedup._FAMS2, True)):
            got = dedup._window_keys_batch(texts, n, fams)
            for t, g in zip(texts, got):
                assert np.array_equal(g, built(t, n, dual)), (n, dual, t)
