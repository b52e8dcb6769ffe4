"""Deduplication operators for training-data pipelines — exact,
n-gram Jaccard, SimHash, MinHash+LSH (SURVEY.md §7.1 step 10).

All operators are `DataFrame → DataFrame` with bounded shuffle keys —
no driver-side collects, no per-row Python. Scale posture per operator:

- **exact**: one hash-aggregate shuffle on the content key. At 100 TB,
  dedup on a 64-bit fingerprint first (cheap, colocates candidates) and
  compare full text only within fingerprint groups.
- **n-gram Jaccard**: the classic shingle-inverted-index join. The self
  join on shingle is the scale bottleneck: its fan-out is Σ df(s)² over
  shingle document frequencies. `max_df` drops ubiquitous shingles
  (stopword runs) which caps fan-out with negligible recall loss — the
  standard trick; exact (default) keeps every shingle.
- **SimHash**: signature is a narrow per-row projection; candidate
  pairing is an equality self-join on the signature (hash-partitioned,
  no fan-out) — the 100 TB-friendly near-dup prefilter.
- **MinHash+LSH**: k hash-mins per row (narrow), then one shuffle per
  banding on (band_id, band_hash) buckets. Bucket sizes are the only
  skew risk; ubiquitous-shingle capping (`max_df`) tames them too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import shingles

# SimHash per-token key: char-level polynomial hash (base 31, Mersenne
# modulus). Cross-engine deterministic — the DuckDB oracle re-derives it
# from these constants (plans/dedup_queries.py).
SIMHASH_BASE = 31
SIMHASH_MOD = 2147483647
SIMHASH_BITS = 16


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-`order_col` row per content key
    (deterministic winner). One shuffle on the key columns."""
    w = W.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def doc_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exploded distinct (id, shingle) pairs; optional document-frequency
    cap dropping shingles present in more than `max_df` docs."""
    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
    )
    if max_df is not None:
        df_counts = ex.groupBy("shingle").agg(F.count("*").alias("_df"))
        ex = (
            ex.join(df_counts.filter(F.col("_df") <= max_df), "shingle")
            .select("doc_id", "shingle")
        )
    return ex


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs: (doc_a, doc_b, jaccard) for
    every pair with shingle-set Jaccard ≥ threshold.

    Complete for threshold > 0 (any qualifying pair shares ≥1 shingle, so
    the inverted-index join surfaces it) — unlike LSH this is exact, at
    the cost of the shingle self-join fan-out (see module docstring).
    """
    ex = doc_shingles(docs, id_col, text_col, n, max_df)
    if max_df is None:
        # set size straight from the array — no second aggregation over
        # the exploded rows
        sizes = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.array_distinct(shingles(text_col, n))).alias("n_shingles"),
        )
    else:
        sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    # join on a 64-bit shingle hash: the shuffle moves 8-byte keys
    # instead of ~25-byte strings and compares longs. A cross-shingle
    # xxhash64 collision (≈ d²/2⁶⁵ for d distinct shingles — ~1e-9 at
    # sf0.1) would overcount one pair's intersection by 1; accepted.
    exh = ex.select("doc_id", F.xxhash64("shingle").alias("sh"))
    a = exh.alias("a")
    b = exh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")
    )
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _char_poly_key(w: Column) -> Column:
    """Char-level polynomial word hash: fold (acc·31 + codepoint) mod M."""
    return F.aggregate(
        F.split(w, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * SIMHASH_BASE + F.ascii(c)) % SIMHASH_MOD,
    )


def simhash(text_col: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash signature over whitespace tokens (with multiplicity).

    Bit i of the signature is the sign of Σ_tokens (±1 depending on bit i
    of the token's char-polynomial key). Pure array expressions — one
    narrow projection per row, no shuffle.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    keys = F.transform(F.split(c, " "), _char_poly_key)
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(bits)])
    # ONE pass over the tokens: the accumulator is the per-bit vote
    # vector, updated with a vectorized zip against the mask array
    # (16 separate folds would rescan the token array 16×).
    votes = F.aggregate(
        keys,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, k: F.zip_with(
            acc,
            masks,
            lambda a, m: a
            + F.when(k.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    # combine: bit i set iff votes[i] > 0
    return F.aggregate(
        F.zip_with(
            votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Candidate near-dup pairs with identical SimHash — an equality
    self-join on the signature (hash join, no fan-out)."""
    sigs = docs.select(
        F.col(id_col).alias("doc_id"), simhash(text_col).alias("sig")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    return a.join(
        b,
        (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.sig").alias("sig"),
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    max_df: int | None = None,
) -> DataFrame:
    """MinHash signatures: per doc, min over shingles of xxhash64(shingle,
    seed=k) for k in 0..num_hashes-1. xxhash64 is Spark-native (JVM,
    codegen) — this is a narrow projection + one groupBy(doc_id)."""
    ex = doc_shingles(docs, id_col, text_col, n, max_df)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(k))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    sig = ex.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"h{k}" for k in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard-verified.

    signature → `bands` bands of rows_per_band hashes → bucket join on
    (band_id, band_hash) → candidate pairs → verify with exact shingle
    Jaccard ≥ threshold. With b=32, r=2: P(candidate | J=0.8) ≈ 1−(1−0.8²)^32
    ≈ 1-6e-15 — recall is effectively 1 at the planted-dup similarity,
    while J≤0.1 pairs almost never collide (the verify join stays tiny).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, n, num_hashes, max_df)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"),
                        F.xxhash64(
                            *[F.col("signature")[bi * r + j] for j in range(r)]
                        ).alias("band_hash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact-verify ONLY the candidate pairs: join each side to its
    # distinct shingle set and compute set Jaccard per pair. Cost scales
    # with #candidates (tiny after banding), not #pairs. Sets carry the
    # 64-bit shingle hashes, not strings (same collision caveat as the
    # inverted-index join in ngram_jaccard_pairs).
    sets = (
        doc_shingles(docs, id_col, text_col, n, max_df)
        .select("doc_id", F.xxhash64("shingle").alias("shingle"))
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        candidates.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
