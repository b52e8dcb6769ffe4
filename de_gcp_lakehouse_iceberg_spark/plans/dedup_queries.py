"""Deduplication query corpus — exact, n-gram Jaccard, SimHash,
MinHash+LSH over the `documents` table (SURVEY.md §7.1 step 10).

Oracle strategy mirrors text_queries.py: SQL generated from the same
constants as the Spark plans. The MinHash+LSH entry has NO SQL oracle
(xxhash64 is Spark-native; DuckDB cannot reproduce it) — the driver
records the weaker rows-only check, and tests/test_dedup.py closes the
gap by asserting the LSH pair set equals the exact-Jaccard pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_BAND_MULT,
    MINHASH_P,
    SIMHASH_BASE,
    SIMHASH_BITS,
    SIMHASH_MOD,
    minhash_coeffs,
    minhash_lsh_pairs,
    near_dup_pairs,
    simhash,
    simhash_fast,
)
from ..tables import table
from .queries import _r, register


# --------------------------------------------------------------------------
# q34 — exact deduplication via hash-groupBy on content (the cheap pass).
# --------------------------------------------------------------------------
@register(
    "q34_exact_dedup",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS doc_count,
           CAST(count(DISTINCT text) AS BIGINT) AS distinct_texts,
           CAST(count(*) - count(DISTINCT text) AS BIGINT) AS dups_removed
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q34_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.countDistinct("text").alias("distinct_texts"),
            (F.count("*") - F.countDistinct("text")).alias("dups_removed"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q35 — n-gram (3-shingle) Jaccard near-dup pairs, J ≥ 0.5, at the
# DEPLOYMENT shape (r11 verdict task #1, the q70 pattern): the gate runs
# `near_dup_pairs` with measured auto-routing — the exact inverted-index
# join while Σ df²/rows is benign (every driver-gate fixture), the banded
# portable-LSH pipeline past JACCARD_LSH_FANOUT_RATIO (the sf3 bench
# fixture, whose exact form breached BASELINE B2's 120 s). The oracle
# stays the exact-Jaccard SQL: both routes produce the same pair set at
# the gated threshold (recall ≈ 1−1e-4 at J ≥ 0.5, pinned by
# test_dedup.py::test_lsh_pairs_equal_exact_pairs), and the raw
# exact-join kernel remains the pytest-only baseline
# (test_dedup.py::test_ngram_jaccard_*). Jaccard itself is a single
# division of exact integers → bit-identical doubles on both routes.
# --------------------------------------------------------------------------
_SHINGLE_SQL = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, greatest(len(t) - 2, 1)),
               i -> array_to_string(list_slice(t, i + 1, i + 3), ' ')
             )) AS shingles
      FROM toks),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY doc_id)
"""


@register(
    "q35_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS common
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b)
    SELECT p.doc_a, p.doc_b,
           floor(CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common)
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common) >= 0.5
    ORDER BY p.doc_a, p.doc_b
    """,
)
def q35_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # The gate drives the DEPLOYMENT entry point (near_dup_pairs with
    # measured routing — the r12 re-pin), but the hash gate compares
    # against an EXACT oracle, so AT GATE SCALE the measured route
    # must be 'exact': if a gate fixture's Σ df² fan-out ever drifts
    # past JACCARD_LSH_FANOUT_RATIO the gate would silently compare
    # banded-LSH output (recall ~1−1e-4, not 1) and fail
    # NONDETERMINISTICALLY (r12 ADVICE). The assert is BOUND to gate
    # scale (the driver gate runs at sf0.01, pytest parity at
    # sf0.001/0.01 — ≤500 docs; _GATE_SCALE_MAX_DOCS leaves 20×
    # headroom): at bench scales (sf1's 50k docs flip the measured
    # route to LSH by design) the routed shape runs un-asserted, as a
    # perf measurement with no oracle comparison attached.
    from de_gcp_lakehouse_iceberg_spark.operators.dedup import (
        choose_jaccard_route,
    )

    _GATE_SCALE_MAX_DOCS = 10_000
    route = choose_jaccard_route(docs)
    if route != "exact" and docs.count() <= _GATE_SCALE_MAX_DOCS:
        raise RuntimeError(
            "q35 gate fixture drifted: choose_jaccard_route picked "
            f"{route!r} at gate scale, but the hash gate's oracle is "
            "exact Jaccard — re-pin the fixture or move the gate to an "
            "LSH-tolerant oracle (LSH≡exact equality at gate "
            "thresholds is pinned separately by "
            "test_lsh_pairs_equal_exact_pairs)"
        )
    pairs = near_dup_pairs(docs, threshold=0.5, route=route)
    return pairs.select(
        "doc_a", "doc_b", _r(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# q36 — SimHash signatures: per-language signature cardinality + number
# of identical-signature (candidate-dup) pairs Σ c·(c−1)/2.
# --------------------------------------------------------------------------
def _simhash_sql() -> str:
    keys = f"""list_transform(string_split(text, ' '),
        w -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(w, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * {SIMHASH_BASE} + x) % {SIMHASH_MOD}))"""
    bit_terms = " + ".join(
        f"""(CASE WHEN list_sum(list_transform(ks,
               k -> CASE WHEN (k & {1 << i}) <> 0 THEN 1 ELSE -1 END)) > 0
             THEN {1 << i} ELSE 0 END)"""
        for i in range(SIMHASH_BITS)
    )
    return f"""
    keyed AS (SELECT lang, doc_id, {keys} AS ks FROM documents),
    sigs AS (SELECT lang, doc_id, CAST({bit_terms} AS BIGINT) AS sig FROM keyed)
    """


@register(
    "q36_simhash",
    oracle=f"""
    WITH {_simhash_sql()},
    groups AS (
      SELECT lang, sig, CAST(count(*) AS BIGINT) AS c
      FROM sigs GROUP BY lang, sig)
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS doc_count,
           CAST(count(*) AS BIGINT) AS distinct_sigs,
           CAST(sum(c * (c - 1) / 2) AS BIGINT) AS colliding_pairs
    FROM groups
    GROUP BY lang
    ORDER BY lang
    """,
)
def q36_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # simhash_fast == simhash (expression form) bit-for-bit — integer
    # math end to end; the oracle SQL above mirrors the expression form
    docs = table(spark, sf_dir, "documents")
    groups = (
        docs.select("lang", simhash_fast("text").alias("sig"))
        .groupBy("lang", "sig")
        .agg(F.count("*").alias("c"))
    )
    return (
        groups.groupBy("lang")
        .agg(
            F.sum("c").alias("doc_count"),
            F.count("*").alias("distinct_sigs"),
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("long")
            .alias("colliding_pairs"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q37 — MinHash+LSH near-dup pairs (scale path), FULL oracle: the query
# runs hash_mode="portable" — shingle keys are char-polynomial mod P and
# the 64-hash family is (A_k·key + B_k) mod P with coefficients shared
# between this SQL generator and the Spark operator, so DuckDB replays
# the ENTIRE pipeline (signatures → banding → bucket join → exact
# verify) and the driver hash-compares the surviving pairs. The
# xxhash64 default stays the faster production path; tests assert both
# modes produce the exact-Jaccard pair set.
# --------------------------------------------------------------------------
def _minhash_sql(num_hashes: int = 64, bands: int = 32) -> str:
    r = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes)
    mins = ",\n             ".join(
        f"min(({a} * key + {b}) % {MINHASH_P}) AS h{k}"
        for k, (a, b) in enumerate(coeffs)
    )

    def band_expr(bi: int) -> str:
        acc = f"h{bi * r}"
        for j in range(1, r):
            acc = f"(({acc}) * {MINHASH_BAND_MULT} + h{bi * r + j}) % {MINHASH_P}"
        return acc

    band_ids = ", ".join(str(bi) for bi in range(bands))
    band_hashes = ",\n             ".join(band_expr(bi) for bi in range(bands))
    return f"""
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, greatest(len(t) - 2, 1)),
               i -> array_to_string(list_slice(t, i + 1, i + 3), ' ')
             )) AS shingles
      FROM toks),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    keys AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(s, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * {SIMHASH_BASE} + x) % {MINHASH_P}) AS key
      FROM ex),
    minh AS (
      SELECT doc_id,
             {mins}
      FROM keys GROUP BY doc_id),
    bands AS (
      SELECT doc_id,
             unnest([{band_ids}]) AS band_id,
             unnest([{band_hashes}]) AS bh
      FROM minh),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id),
    ksets AS (
      SELECT doc_id, CAST(count(DISTINCT key) AS BIGINT) AS nk
      FROM keys GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(count(DISTINCT ka.key) AS BIGINT) AS common
      FROM cand c
      JOIN keys ka ON ka.doc_id = c.doc_a
      JOIN keys kb ON kb.doc_id = c.doc_b AND kb.key = ka.key
      GROUP BY c.doc_a, c.doc_b)
    """


@register(
    "q37_minhash_lsh",
    oracle=f"""
    WITH {_minhash_sql(64, 32)}
    SELECT i.doc_a, i.doc_b,
           floor(CAST(i.common AS DOUBLE) / (sa.nk + sb.nk - i.common)
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM inter i
    JOIN ksets sa ON i.doc_a = sa.doc_id
    JOIN ksets sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.common AS DOUBLE) / (sa.nk + sb.nk - i.common) >= 0.5
    ORDER BY i.doc_a, i.doc_b
    """,
)
def q37_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, num_hashes=64, bands=32, threshold=0.5, hash_mode="portable"
    )
    return pairs.select(
        "doc_a", "doc_b", _r(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("doc_a", "doc_b")
