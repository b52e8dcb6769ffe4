"""Distributed BPE tokenizer training (byte-pair-encoding merge
learning) — the tokenizer-fitting step of a training-data pipeline,
run on-cluster instead of on a sampled corpus.

Spark-first shape (Sennrich et al. 2016 restated for a cluster):

1. ONE corpus-scale shuffle builds the unique-word frequency table
   (`groupBy(word).count()` — map-side combinable). Everything after
   operates on that vocabulary-sized table, which is orders of
   magnitude smaller than the corpus (Heaps' law), so each merge
   iteration is an aggregate over ~millions of rows even at 100 TB.
2. Each word is rewritten as a sequence of marker-wrapped symbols
   (`\\x02sym\\x03`), so a merge is a plain `replace()` of
   `\\x02a\\x03\\x02b\\x03` with `\\x02ab\\x03` — left-to-right
   non-overlapping, the exact greedy semantics of reference BPE
   (`a a a` + merge(a,a) -> `aa a`, not `aa aa`).
3. Per iteration: count adjacent symbol pairs (weighted by word
   frequency), pick the argmax with a deterministic tie-break
   (count DESC, left ASC, right ASC), apply the merge. The only
   driver-side state is the n_merges winning rows (bounded, like
   k-means centroids).

Cross-engine determinism: every number is an exact integer (pair
counts, token counts); the only per-iteration collect is one row.
`pair_count` counts overlapping adjacents (the zip convention both
engines share); `tokens_after` is measured from the rewritten strings,
so it reflects true greedy non-overlapping application — the gap
between the two is exactly what a naive `prev - count` shortcut gets
wrong, which is why tokens_after is part of the gate.

Reference parity: the reference has no tokenizer surface; this extends
its corpus analytics (PRD corpus Q-series) with the standard
training-data capability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_M2 = chr(2)  # symbol start marker
_M3 = chr(3)  # symbol end marker


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent symbol pairs of every word sequence, weighted by word
    frequency. Overlapping adjacents all count (zip convention)."""
    inner = F.expr(f"trim(LEADING '{_M2}' FROM trim(TRAILING '{_M3}' FROM seq))")
    arr = F.split(inner, _M3 + _M2)
    toks = seqs.select(arr.alias("t"), "freq").filter(F.size("t") >= 2)
    zipped = F.arrays_zip(
        F.slice("t", 1, F.size("t") - 1).alias("a"),
        F.slice("t", 2, F.size("t") - 1).alias("b"),
    )
    return (
        toks.select(F.explode(zipped).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("lhs"), F.col("p.b").alias("rhs"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The one corpus-scale shuffle: unique words with counts."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_learn(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Learn `n_merges` BPE merges over the corpus. Returns a small
    DataFrame (step, lhs, rhs, pair_count, tokens_after) where
    tokens_after is the corpus-wide token count after applying merges
    0..step greedily (computed from the rewritten vocabulary, weighted
    by word frequency)."""
    words = word_frequencies(docs, text_col)
    seqs = words.select(
        F.regexp_replace("word", "(.)", _M2 + "$1" + _M3).alias("seq"),
        "freq",
    ).persist()
    # One job materializes the base AND yields the corpus word count.
    total_freq = int(
        seqs.agg(F.sum("freq").alias("f")).collect()[0]["f"] or 0
    )

    # Per iteration, ONE aggregate over the pair table yields both the
    # winning merge — min of (-count, lhs, rhs) is argmax with the
    # (count DESC, lhs ASC, rhs ASC) tie-break — and the total pair
    # weight. Since every word's symbol count is its adjacent-pair
    # count + 1, corpus tokens = total pair weight + total word
    # frequency EXACTLY, so the previous iteration's tokens_after falls
    # out of this iteration's aggregate for free (one extra iteration
    # closes the last merge). The oracle recomputes tokens_after from
    # string lengths — an independent path onto the same integers.
    rows = []
    pending = None  # (step, lhs, rhs, count) awaiting its tokens_after
    try:
        cur = seqs
        for step in range(n_merges + 1):
            agg = (
                _pair_counts(cur)
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("pair_count")).alias("negc"),
                            F.col("lhs"),
                            F.col("rhs"),
                        )
                    ).alias("best"),
                    F.sum("pair_count").alias("pw"),
                )
                .collect()[0]
            )
            tokens_now = int(agg["pw"] or 0) + total_freq
            if pending is not None:
                rows.append((*pending, tokens_now))
            if step == n_merges or agg["best"] is None:
                break
            lhs, rhs = agg["best"]["lhs"], agg["best"]["rhs"]
            cnt = -int(agg["best"]["negc"])
            pending = (step, lhs, rhs, cnt)
            pat = _M2 + lhs + _M3 + _M2 + rhs + _M3
            rep = _M2 + lhs + rhs + _M3
            cur = cur.select(
                F.replace(F.col("seq"), F.lit(pat), F.lit(rep)).alias("seq"),
                "freq",
            )
    finally:
        seqs.unpersist()

    return spark.createDataFrame(
        rows, "step int, lhs string, rhs string, pair_count bigint, tokens_after bigint"
    )


def bpe_apply(text: Column | str, merges: list[tuple[str, str]]) -> Column:
    """Segment text with a learned merge list: array<string> of BPE
    tokens in document order. Pairs never cross spaces (words are
    wrapped independently); application is greedy left-to-right in
    merge order — the standard BPE inference convention. Pure codegen
    string ops (no UDF)."""
    c = F.col(text) if isinstance(text, str) else text
    seq = F.regexp_replace(c, "([^ ])", _M2 + "$1" + _M3)
    for lhs, rhs in merges:
        seq = F.replace(
            seq,
            F.lit(_M2 + lhs + _M3 + _M2 + rhs + _M3),
            F.lit(_M2 + lhs + rhs + _M3),
        )
    return F.regexp_extract_all(
        seq, F.lit(_M2 + "([^" + _M2 + _M3 + "]+)" + _M3), 1
    )
