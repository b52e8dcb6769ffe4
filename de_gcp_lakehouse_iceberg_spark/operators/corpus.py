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
hash shuffle, and only the survivors pay the near-dup stage. That stage
AUTO-ROUTES by default: a linear Σ df² estimate over the cached shingle
signing picks the exact inverted-index join while its fan-out is benign
and the banded-LSH route once it is not (see clean_corpus), so the
default a user gets at 100 TB is scale-safe without giving up the
exact, oracle-verified baseline at gate scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from .dedup import doc_shingles, exact_dedup, near_dup_pairs


def clean_corpus(
    docs: DataFrame,
    quality_threshold: float = 0.7,
    langs: list[str] | None = None,
    jaccard_threshold: float = 0.5,
    use_lsh: bool | None = None,
) -> DataFrame:
    """Returns the cleaned corpus (same columns as input).

    `use_lsh=None` (the default) AUTO-ROUTES the near-dup stage: one
    linear pre-pass over the (cached) shingle signing estimates the
    exact inverted-index join's fan-out Σ df², and the pipeline takes
    the LSH route when the ratio Σ df² / shingle-rows exceeds
    `dedup.JACCARD_LSH_FANOUT_RATIO` — the regime where the exact join
    goes quadratic (saturated vocabularies / stopword-heavy corpora;
    the r8 sf3 ledger measured q44's default at 60 s for exactly this
    reason). Below the threshold the exact route runs and REUSES the
    pre-pass's cached signing, so gate-scale corpora keep the exact
    oracle-verified baseline at unchanged cost. Both routes return the
    same survivor set at the gated thresholds (LSH recall at b=32/r=2
    is 1−(1−t^r)^b ≈ 1−1e-4 for J ≥ 0.5; pinned by
    test_lsh_pairs_equal_exact_pairs). Pass True/False to force."""
    kept = docs.withColumn("_q", quality_score("text")).filter(
        F.col("_q") >= quality_threshold
    )
    if langs:
        kept = kept.filter(F.col("lang").isin(langs))
    # exact dedup: lowest doc_id wins per identical text — the shared
    # struct-MIN aggregate (partial combine, no window sort)
    kept = exact_dedup(kept.drop("_q"), ["text"], "doc_id")
    # near-dup removal on the survivors: drop the higher id of each pair
    route = None if use_lsh is None else ("lsh" if use_lsh else "exact")
    pairs = near_dup_pairs(kept, threshold=jaccard_threshold, route=route)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return kept.join(losers, "doc_id", "left_anti")


def contamination_overlap(
    docs: DataFrame,
    eval_ids: DataFrame,
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for every training doc, the share
    of its distinct n-gram shingles that also appear anywhere in the
    held-out/benchmark set (`eval_ids`: one `doc_id` column naming the
    benchmark docs; benchmark docs are excluded from the output).

    Returns (doc_id, n_shingles, eval_hits, overlap) with
    overlap = eval_hits / n_shingles ∈ [0, 1].

    Scale posture: benchmarks are tiny relative to a training corpus, so
    the distinct benchmark shingle set is BROADCAST (the standard
    decontamination shape — a 100 TB corpus streams past a few MB of
    benchmark n-grams; no corpus-sized shuffle). The training side is
    one explode + one per-doc count.
    """
    # The benchmark side explodes ONLY the eval docs (tiny at any
    # corpus size); the training side filters the canonical
    # doc_shingles(docs) explode — that exact subtree is what a
    # deployment keeps cached (bench.py pins it), so this plan
    # substitutes the shared in-memory index instead of re-exploding.
    # Hits and sizes come from ONE aggregation pass: the left join
    # against the DISTINCT broadcast shingle set cannot fan out (≤1
    # match per probe).
    eval_sh = (
        doc_shingles(docs.join(eval_ids, "doc_id", "left_semi"), n=n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train_ex = doc_shingles(docs, n=n).join(eval_ids, "doc_id", "left_anti")
    return (
        train_ex.join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("eval_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "eval_hits",
            (F.col("eval_hits").cast("double") / F.col("n_shingles")).alias(
                "overlap"
            ),
        )
    )


def select_within_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "lang",
) -> DataFrame:
    """Data selection under a token budget: per group, admit docs in
    quality order (quality_score desc, doc_id asc as the deterministic
    tie-break) until the cumulative token count would exceed the budget.
    The greedy-by-quality prefix is the published corpus-curation
    baseline for fixed training-token targets.

    Returns the selected docs with `n_tokens`, `quality`, and the
    running `cum_tokens`. One shuffle on the group key; the window
    cumsum is a single in-partition pass. At 100 TB, groups are
    language/source-sized (dozens) — if a single group outgrows one
    reducer's sort budget, pre-aggregate doc summaries (doc_id, tokens,
    quality — a few bytes/doc) rather than sorting full text: only the
    summary needs the window, and the winners semi-join back.
    """
    w = (
        W.partitionBy(group_col)
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    scored = docs.select(
        "doc_id",
        F.col(group_col),
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )


def unigram_doc_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Unigram language-model quality score — the engine's stand-in for
    CCNet's per-language LM perplexity filter (no model weights ship in
    this container; a unigram LM *is* derivable from the corpus alone
    and exercises the same pipeline shape: global vocabulary statistics
    → per-token score → per-document aggregate → filter threshold).

    score(doc) = mean over its tokens of log2 p(token | lang), with
    p = count(token, lang) / count(*, lang) estimated from the SAME
    corpus. Higher (closer to 0) = more typical text; gibberish and
    rare-token soup go very negative.

    Determinism across engines: each per-token log2 is quantized to
    6dp (floor(x·1e6 + 0.5)/1e6) and per-doc accumulation is an EXACT
    decimal sum, so the result is independent of aggregation order —
    the q42/q62 convention.

    Scale: one (lang, token) count shuffle + one (lang, token) join of
    the exploded corpus back to the vocabulary — both key-partitioned;
    the vocabulary side is the distinct-token table, orders of
    magnitude smaller than the corpus.

    Returns (id_col, lang_col, n_tokens, score).
    """
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col), F.col(lang_col), F.explode(tokens(text_col)).alias("t")
    )
    counts = toks.groupBy(lang_col, "t").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy(lang_col).agg(F.sum("c").alias("n"))
    lp = counts.join(totals, lang_col).select(
        lang_col,
        "t",
        (
            F.floor(F.log2(F.col("c") / F.col("n")) * 1_000_000 + F.lit(0.5))
            / 1_000_000
        ).alias("lp_q"),
    )
    # shuffle_hash, never broadcast: the score table is VOCABULARY-
    # sized (Heaps' law — it grows with the corpus, ~370k rows already
    # at sf3), so at scale it can never broadcast; and at sf1 Spark's
    # size estimate sneaked it under the auto-broadcast threshold,
    # where rebuilding the ~200k-row hash table on every executor made
    # the join the ledger's worst entry (measured 3-run A/B at sf1:
    # default/broadcast [8.8, 4.0, 6.0] s vs shuffle_hash
    # [3.1, 2.1, 2.0] s — SCALE.md r13 closing notes). The shuffled
    # form also re-keys the corpus on (lang, t), the same key the
    # counts aggregation used.
    return (
        toks.join(lp.hint("shuffle_hash"), [lang_col, "t"])
        .groupBy(id_col, lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.floor(
                    F.sum(F.col("lp_q").cast("decimal(28,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("score"),
        )
    )


def bigram_doc_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram language-model quality score — the fidelity
    step up from `unigram_doc_scores` toward CCNet's n-gram (KenLM)
    perplexity filter: per transition i,
        p_i = λ·p(tᵢ | tᵢ₋₁) + (1−λ)·p(tᵢ),
    with p(tᵢ|tᵢ₋₁) = c(tᵢ₋₁,tᵢ)/c_head(tᵢ₋₁) and p(tᵢ) = c(tᵢ)/N,
    all estimated per language from the scored corpus itself (every
    corpus bigram is seen, so p_i > 0; interpolation still smooths
    rare-head transitions toward the unigram floor).

    score(doc) = mean over its transitions of log2 p_i. Cross-engine
    determinism follows the q86 recipe exactly: ratios of exact ints
    (IEEE division), λ = 0.75 binary-exact, per-transition log2
    quantized to 6dp, per-doc accumulation an exact decimal sum —
    order-independent and DuckDB-replayable (q93).

    Scale: bigrams are built with array ops (slice + arrays_zip —
    zero joins, zero extra shuffles per doc); the model side is two
    vocabulary-scale aggregations (bigram counts, head counts) plus
    the unigram table, then ONE key-partitioned join of the exploded
    transitions against the bigram score table.

    Returns (id_col, lang_col, n_bigrams, score).
    """
    from ..functions.text import tokens

    arr = docs.select(
        F.col(id_col), F.col(lang_col), tokens(text_col).alias("t")
    ).filter(F.size("t") >= 2)
    bg = arr.select(
        id_col,
        lang_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1).alias("p"),
                F.slice(F.col("t"), 2, F.size("t") - 1).alias("c"),
            )
        ).alias("b"),
    ).select(id_col, lang_col, F.col("b.p").alias("p"), F.col("b.c").alias("c"))

    toks = docs.select(
        F.col(lang_col), F.explode(tokens(text_col)).alias("tok")
    )
    uc = toks.groupBy(lang_col, "tok").agg(F.count(F.lit(1)).alias("cu"))
    un = uc.groupBy(lang_col).agg(F.sum("cu").alias("n"))
    bgc = bg.groupBy(lang_col, "p", "c").agg(F.count(F.lit(1)).alias("cb"))
    hc = bg.groupBy(lang_col, "p").agg(F.count(F.lit(1)).alias("ch"))

    prob = (
        F.lit(lam) * (F.col("cb") / F.col("ch"))
        + F.lit(1.0 - lam) * (F.col("cu") / F.col("n"))
    )
    lp = (
        bgc.join(hc, [lang_col, "p"])
        .join(uc.withColumnRenamed("tok", "c"), [lang_col, "c"])
        .join(un, lang_col)
        .select(
            lang_col,
            "p",
            "c",
            (F.floor(F.log2(prob) * 1_000_000 + F.lit(0.5)) / 1_000_000)
            .alias("lp_q"),
        )
    )
    # shuffle_hash for the same reason as unigram_doc_scores: the
    # bigram score table is corpus-scaled (never broadcastable at
    # 100 TB) and the broadcast plan Spark picks at small-SF estimates
    # is the slower shape even there.
    return (
        bg.join(lp.hint("shuffle_hash"), [lang_col, "p", "c"])
        .groupBy(id_col, lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.floor(
                    F.sum(F.col("lp_q").cast("decimal(28,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 1_000_000
                    + F.lit(0.5)
                )
                / 1_000_000
            ).alias("score"),
        )
    )
