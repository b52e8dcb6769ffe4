"""Text-analysis primitives for training-data pipelines — language ID,
quality scoring, token counting, document fingerprinting (SURVEY.md §7.1
step 10; modeled on the per-row logic the reference keeps in Beam DoFns,
e.g. main.py:21-146, re-expressed as vectorized Column builders).

Everything here is a pure ``Column`` expression — JVM-side, inside
whole-stage codegen, no Python UDFs. At 100 TB these run as a single
narrow projection over the scan: no shuffle, no driver involvement.

Determinism contract: every function is reproducible bit-for-bit across
engines (the DuckDB oracles in plans/text_queries.py recompute them with
the same operation order), which is what makes text-derived columns safe
dedup/filter keys in a distributed pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker vocab per language for the n-gram-heuristic language ID. Short
# literal lists so the same sets inline into the SQL oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["customer", "hash", "join", "column", "batch"],
    "en": ["the", "a", "order", "table", "window"],
    "es": ["slow", "agg", "merge", "vector", "query"],
    "fr": ["scan", "data", "small", "key", "line"],
    "zh": ["stream", "fast", "value", "row", "filter"],
}

STOPWORDS: list[str] = ["the", "a", "of", "to", "in", "and"]

# Polynomial rolling-hash constants (fingerprint): classic string-hash
# base 1000003 (a prime), modulus 2^31-1 (Mersenne prime).
_FP_BASE = 1000003
_FP_MOD = 2147483647


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (single-space convention of the corpus)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def unique_token_ratio(text: Column | str) -> Column:
    """Lexical diversity: distinct tokens / total tokens (double)."""
    t = tokens(text)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def stopword_hits(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS
    return F.size(F.filter(tokens(text), lambda w: w.isin(sw)))


def quality_score(text: Column | str) -> Column:
    """Deterministic document quality in [0,1]:
    0.4·min(1, tokens/50) + 0.3·(1 − stopword_ratio) + 0.3·unique_ratio.

    The shape mirrors the reference's data-quality ratios
    (PRD.md:2759-2775): bounded components, fixed weights.
    """
    n = token_count(text).cast("double")
    length_part = F.least(F.lit(1.0), n / F.lit(50.0))
    stop_ratio = stopword_hits(text).cast("double") / n
    uniq = unique_token_ratio(text)
    return (
        F.lit(0.4) * length_part
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3) * uniq
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit count per candidate language (the n-gram heuristic)."""
    t = tokens(text)
    return {
        lang: F.size(F.filter(t, lambda w: w.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column | str) -> Column:
    """Argmax language over marker-hit scores; ties break to the
    alphabetically-first language (deterministic across engines)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out: Column | None = None
    for lang in sorted(scores):  # alphabetical ⇒ first-wins tie-break
        cond = scores[lang] == best
        out = F.when(cond, lang) if out is None else out.when(cond, lang)
    return out


def _word_key(w: Column) -> Column:
    """Per-token integer key: length·31 + codepoint of first char."""
    return (F.length(w) * 31 + F.ascii(w)).cast("long")


def fingerprint(text: Column | str) -> Column:
    """Order-sensitive rolling-hash document fingerprint:
    fold over tokens of ``h = (h·1000003 + key(w)) mod (2^31−1)``.

    A sequential fold is intrinsically order-dependent, so it runs inside
    the row (``F.aggregate`` over the token array) — per-row narrow op,
    embarrassingly parallel across rows.
    """
    keyed = F.transform(tokens(text), _word_key)
    return F.aggregate(
        keyed,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _FP_BASE + x) % _FP_MOD,
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle strings (default 3) for Jaccard/MinHash dedup.

    Built with sequence+transform over the token array — stays JVM-side.
    Documents shorter than ``n`` tokens yield their full text as the one
    shingle (so every doc has ≥1 shingle and Jaccard is well-defined).
    """
    t = tokens(text)
    k = F.size(t)
    # greatest(k-n, 0) keeps sequence() well-formed for short docs, where
    # the single clamped slice degenerates to the full text.
    return F.transform(
        F.sequence(F.lit(0), F.greatest(k - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
    )


def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Duplicate n-gram ratio — the published repetition filter from
    large-corpus quality pipelines (e.g. the Gopher/MassiveText rules):
    1 − distinct_ngrams / total_ngrams, in [0, 1). 0 = no repeated
    n-gram; word-salad spam scores high. Pure Column expression over the
    shingle array (with multiplicity), one narrow pass per row."""
    sh = shingles(text, n)
    return (
        F.lit(1.0)
        - F.size(F.array_distinct(sh)).cast("double") / F.size(sh)
    )
