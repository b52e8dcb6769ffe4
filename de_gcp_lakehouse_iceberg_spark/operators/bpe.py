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


def _pair_rows(seqs: DataFrame) -> DataFrame:
    """Un-aggregated adjacent symbol pairs (lhs, rhs, freq) of every
    word sequence — the explode feeding `_pair_counts`' aggregation
    (split out in r15 so the incremental sequential learner can merge
    delta pair rows and the standing count table in ONE aggregation).
    Overlapping adjacents all count (zip convention)."""
    inner = F.expr(f"trim(LEADING '{_M2}' FROM trim(TRAILING '{_M3}' FROM seq))")
    arr = F.split(inner, _M3 + _M2)
    toks = seqs.select(arr.alias("t"), "freq").filter(F.size("t") >= 2)
    zipped = F.arrays_zip(
        F.slice("t", 1, F.size("t") - 1).alias("a"),
        F.slice("t", 2, F.size("t") - 1).alias("b"),
    )
    return toks.select(F.explode(zipped).alias("p"), "freq").select(
        F.col("p.a").alias("lhs"), F.col("p.b").alias("rhs"), F.col("freq")
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent symbol pairs of every word sequence, weighted by word
    frequency. Overlapping adjacents all count (zip convention)."""
    return (
        _pair_rows(seqs)
        .groupBy("lhs", "rhs")
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


def _pat(lhs: str, rhs: str) -> tuple[str, str]:
    return (
        _M2 + lhs + _M3 + _M2 + rhs + _M3,
        _M2 + lhs + rhs + _M3,
    )


def _compact(cur: DataFrame) -> DataFrame:
    """Lineage checkpoint between merge iterations: drop fully-merged
    single-symbol words (they can never pair again — and their token
    contribution is already inside `total_freq`, so the pairs+words
    identity is untouched) and truncate the replace-chain lineage.
    Without this, iteration N's plan nests N replace projections and
    analysis cost grows linearly per merge — quadratic over a 32k-merge
    vocabulary. One symbol boundary (\\x03\\x02) ⇒ ≥ 2 symbols."""
    return cur.filter(
        F.locate(_M3 + _M2, F.col("seq")) > 0
    ).localCheckpoint()


def select_compatible_merges(
    candidates: list[tuple[str, str, int]], limit: int
) -> list[tuple[str, str, int]]:
    """Greedy batched-merge selection (the standard parallel-BPE
    batching rule): scan candidates in tie-break order and accept up to
    `limit` pairs that are pairwise SYMBOL-DISJOINT — a pair is
    rejected if its lhs, rhs, or concatenation collides with any symbol
    an accepted pair touches. Disjointness makes the accepted merges'
    rewrites commute (each pattern's occurrences are untouched by the
    others), so one projection applies them all. Deterministic given
    the candidate order; pure function so the pytest reference replays
    it exactly."""
    accepted: list[tuple[str, str, int]] = []
    touched: set[str] = set()
    for lhs, rhs, cnt in candidates:
        if len(accepted) >= limit:
            break
        merged = lhs + rhs
        if lhs in touched or rhs in touched or merged in touched:
            continue
        # the new symbol must also not BE an accepted pair's operand
        # (covered by `touched`, which holds operands AND concats)
        accepted.append((lhs, rhs, cnt))
        touched.update((lhs, rhs, merged))
    return accepted


# The sequential learner's size gate (r15, guide §8 — decide with
# small rows): the unique-word table is vocabulary-sized (Heaps' law),
# and when it fits comfortably on the driver the 8-style merge loop is
# pure per-iteration JOB OVERHEAD on a cluster (measured at sf0.1: a
# 31-word vocabulary still paid ~0.42 s of scheduling per iteration).
# Below the gate the loop runs on the COLLECTED (seq, freq) pairs —
# the k-means-centroid-collect posture; bounded: 131072 words × ~100 B
# ≈ 13 MB of driver state. Above it, the distributed incremental
# learner keeps cluster-sized vocabularies cluster-resident.
DRIVER_VOCAB_MAX_WORDS = 131_072


def bpe_learn(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 32,
    merges_per_pass: int = 1,
    driver_vocab_max: int = DRIVER_VOCAB_MAX_WORDS,
) -> DataFrame:
    """Learn `n_merges` BPE merges over the corpus. Returns a small
    DataFrame (step, lhs, rhs, pair_count, tokens_after) where
    tokens_after is the corpus-wide token count after applying merges
    0..step greedily (computed from the rewritten vocabulary, weighted
    by word frequency).

    Scale (VERDICT r8 #5 — a realistic 32k-merge vocabulary, not a toy
    8-merge run):
    - `checkpoint_every`: every K merges the word table is
      localCheckpoint-ed and fully-merged words drop out, so per-merge
      plan-analysis cost is O(K) — constant per merge — instead of
      growing with the merge index (what makes a 32k-merge run
      feasible; at ≤256 merges the dominant cost is the per-iteration
      job round-trip, which batching addresses). On a cluster, use
      reliable checkpoints for fault tolerance; the algorithm is
      identical.
    - `merges_per_pass` > 1: BATCHED learning — each pass takes the top
      M pairwise-symbol-disjoint pairs (see select_compatible_merges)
      and applies them in ONE rewrite, cutting driver round-trips by
      ~M× (measured: the sf0.01 fixture's full 89-merge vocabulary,
      32.3 s sequential → 7.3 s at M=8 — 0.082 s/merge). Disjoint rewrites commute, and each merge's exact applied
      count is measured from the rewrite itself (length delta / 2), so
      tokens_after stays an exact integer per merge. Batching is the
      standard parallel-BPE approximation: it can diverge from strict
      sequential order only when a pair CREATED by an earlier merge in
      the same pass would have out-ranked a later one — rare on natural
      text and bounded by M; `merges_per_pass=1` (default) is exactly
      sequential BPE and is what the q106 driver gate runs.
    - `driver_vocab_max` (r15): sequential learning over a vocabulary
      at most this many unique words collects the (seq, freq) table
      and runs the merge loop on the driver — results IDENTICAL by
      construction (Python `str.replace` is the same greedy
      left-to-right non-overlapping rewrite as Spark's `replace()`,
      tuple ordering matches the struct-MIN tie-break because UTF-8
      byte order preserves code-point order; pinned by
      test_driver_route_equals_distributed). 0 forces the distributed
      incremental learner.
    """
    words = word_frequencies(docs, text_col)
    seqs = words.select(
        F.regexp_replace("word", "(.)", _M2 + "$1" + _M3).alias("seq"),
        "freq",
    ).persist()
    # One job materializes the base AND yields the corpus word count
    # plus the vocabulary size the driver-route gate needs.
    first = seqs.agg(
        F.sum("freq").alias("f"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    total_freq = int(first["f"] or 0)
    n_words = int(first["n"])
    try:
        if merges_per_pass > 1:
            rows = _learn_batched(
                seqs, total_freq, n_merges, checkpoint_every, merges_per_pass
            )
        elif n_words <= driver_vocab_max:
            pairs = [
                (r["seq"], int(r["freq"])) for r in seqs.collect()
            ]
            rows = _learn_sequential_local(pairs, total_freq, n_merges)
        else:
            rows = _learn_sequential(
                seqs, total_freq, n_merges, checkpoint_every
            )
    finally:
        seqs.unpersist()
    return spark.createDataFrame(
        rows,
        "step int, lhs string, rhs string, pair_count bigint, "
        "tokens_after bigint",
    )


def _word_pairs(seq: str) -> list[tuple[str, str]]:
    """A word's adjacent symbol pairs — the Python mirror of
    `_pair_rows`' trim + split (lstrip/rstrip strip ALL leading
    markers, exactly SQL trim(LEADING/TRAILING ...))."""
    syms = seq.lstrip(_M2).rstrip(_M3).split(_M3 + _M2)
    return list(zip(syms, syms[1:]))


def _learn_sequential_local(
    pairs: list[tuple[str, int]], total_freq: int, n_merges: int
) -> list[tuple]:
    """Driver-side sequential merge loop over the collected vocabulary
    (the size-gated route — see bpe_learn). Pair counts are maintained
    INCREMENTALLY: a merge re-counts only the words containing its
    pattern, subtracting their old pairs and adding the rewritten ones
    — the same delta identity the distributed learner uses. All
    arithmetic is exact integers; the tie-break tuple
    (-count, lhs, rhs) is the struct-MIN order."""
    rows: list[tuple] = []
    cur = list(pairs)
    counts: dict[tuple[str, str], int] = {}
    for seq, freq in cur:
        for p in _word_pairs(seq):
            counts[p] = counts.get(p, 0) + freq
    pending = None
    for step in range(n_merges + 1):
        live = {p: c for p, c in counts.items() if c != 0}
        tokens_now = sum(live.values()) + total_freq
        if pending is not None:
            rows.append((*pending, tokens_now))
        if step == n_merges or not live:
            break
        (lhs, rhs), cnt = min(
            live.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        pending = (step, lhs, rhs, cnt)
        pat, rep = _pat(lhs, rhs)
        for i, (seq, freq) in enumerate(cur):
            if pat not in seq:
                continue
            for p in _word_pairs(seq):
                counts[p] -= freq
            new_seq = seq.replace(pat, rep)
            for p in _word_pairs(new_seq):
                counts[p] = counts.get(p, 0) + freq
            cur[i] = (new_seq, freq)
    return rows


def _learn_sequential(
    seqs: DataFrame, total_freq: int, n_merges: int, checkpoint_every: int
) -> list[tuple]:
    # INCREMENTAL pair-count maintenance (r15, guide §2.3): only words
    # containing the winning pattern change between iterations, so the
    # standing (lhs, rhs, pair_count) table is kept as a checkpointed
    # state and each iteration merges a DELTA — the pair rows of the
    # affected words' rewritten form (+freq) minus their old form
    # (−freq) — instead of re-exploding and re-shuffling the whole
    # vocabulary. Exact by construction: recounting an affected word's
    # pairs before/after the same greedy replace() is precisely the
    # full recount restricted to the rows that changed; net-zero pairs
    # are dropped so the table always equals a from-scratch
    # `_pair_counts(cur)` (the pure-Python replay in tests/test_bpe.py
    # and the q106 DuckDB oracle pin this).
    #
    # Per iteration, ONE eager job (the state checkpoint) also yields —
    # as Observation metrics riding the same job, the dedup.py CC
    # pattern — both the winning merge (min of (-count, lhs, rhs) is
    # argmax with the (count DESC, lhs ASC, rhs ASC) tie-break) and the
    # total pair weight. Since every word's symbol count is its
    # adjacent-pair count + 1, corpus tokens = total pair weight +
    # total word frequency EXACTLY, so the previous iteration's
    # tokens_after falls out of this iteration's metrics for free (one
    # extra iteration closes the last merge). The oracle recomputes
    # tokens_after from string lengths — an independent path onto the
    # same integers.
    from pyspark.sql import Observation

    rows: list[tuple] = []
    pending = None  # (step, lhs, rhs, count) awaiting its tokens_after
    cur = seqs
    pc: DataFrame | None = None  # checkpointed standing pair counts
    delta: DataFrame | None = None  # signed pair rows of affected words
    for step in range(n_merges + 1):
        if pc is None:
            upd = _pair_rows(cur)  # first iteration: full count
        else:
            upd = pc.select(
                "lhs", "rhs", F.col("pair_count").alias("freq")
            ).unionByName(delta)
        obs = Observation()
        pc = (
            upd.groupBy("lhs", "rhs")
            .agg(F.sum("freq").alias("pair_count"))
            .filter(F.col("pair_count") != 0)
            .observe(
                obs,
                F.min(
                    F.struct(
                        (-F.col("pair_count")).alias("negc"),
                        F.col("lhs"),
                        F.col("rhs"),
                    )
                ).alias("best"),
                F.sum("pair_count").alias("pw"),
            )
            .localCheckpoint()  # eager, so obs.get below is safe
        )
        agg = obs.get
        tokens_now = int(agg["pw"] or 0) + total_freq
        if pending is not None:
            rows.append((*pending, tokens_now))
        if step == n_merges or agg["best"] is None:
            break
        lhs, rhs = agg["best"]["lhs"], agg["best"]["rhs"]
        cnt = -int(agg["best"]["negc"])
        pending = (step, lhs, rhs, cnt)
        pat, rep = _pat(lhs, rhs)
        # ONE scan of the (persisted) word table builds the delta: each
        # affected word contributes its rewritten pairs at +freq and
        # its old pairs at −freq (a single explode over both forms).
        aff = cur.filter(F.locate(pat, F.col("seq")) > 0)
        delta = _pair_rows(
            aff.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.replace(
                                F.col("seq"), F.lit(pat), F.lit(rep)
                            ).alias("seq"),
                            F.col("freq").alias("freq"),
                        ),
                        F.struct(
                            F.col("seq").alias("seq"),
                            (-F.col("freq")).alias("freq"),
                        ),
                    )
                ).alias("x")
            ).select("x.seq", "x.freq")
        )
        cur = cur.select(
            F.replace(F.col("seq"), F.lit(pat), F.lit(rep)).alias("seq"),
            "freq",
        )
        if (step + 1) % checkpoint_every == 0:
            cur = _compact(cur)
    return rows


def _learn_batched(
    seqs: DataFrame,
    total_freq: int,
    n_merges: int,
    checkpoint_every: int,
    merges_per_pass: int,
) -> list[tuple]:
    rows: list[tuple] = []
    cur = seqs
    # tokens before the first pass, via the pairs+words identity
    tokens = int(
        _pair_counts(cur).agg(F.sum("pair_count")).first()[0] or 0
    ) + total_freq
    since_ckpt = 0
    while len(rows) < n_merges:
        want = min(merges_per_pass, n_merges - len(rows))
        # bounded driver collect: 4×M candidate rows (like the k-means
        # centroid collects), in tie-break order
        cand = [
            (r["lhs"], r["rhs"], int(r["pair_count"]))
            for r in (
                _pair_counts(cur)
                .orderBy(
                    F.desc("pair_count"), F.asc("lhs"), F.asc("rhs")
                )
                .limit(4 * merges_per_pass)
                .collect()
            )
        ]
        if not cand:
            break
        batch = select_compatible_merges(cand, want)
        # exact applied count per merge, measured from the rewrite
        # itself in ONE aggregate over the pre-pass words: replace() IS
        # the greedy application, and each occurrence shortens the
        # string by exactly 2 marker chars. Disjoint symbols ⇒ each
        # pattern's occurrences are independent of the other rewrites.
        applied_exprs = []
        for i, (lhs, rhs, _) in enumerate(batch):
            pat, rep = _pat(lhs, rhs)
            applied_exprs.append(
                F.sum(
                    (
                        F.col("freq")
                        * (
                            F.length("seq")
                            - F.length(
                                F.replace(
                                    F.col("seq"), F.lit(pat), F.lit(rep)
                                )
                            )
                        )
                    ).cast("long")
                ).alias(f"a{i}")
            )
        applied = cur.agg(*applied_exprs).first()
        for i, (lhs, rhs, cnt) in enumerate(batch):
            # each greedy application removes exactly 2 marker chars
            tokens -= int(applied[f"a{i}"] or 0) // 2
            rows.append((len(rows), lhs, rhs, cnt, tokens))
        out = F.col("seq")
        for lhs, rhs, _ in batch:
            pat, rep = _pat(lhs, rhs)
            out = F.replace(out, F.lit(pat), F.lit(rep))
        cur = cur.select(out.alias("seq"), "freq")
        since_ckpt += len(batch)
        if since_ckpt >= checkpoint_every:
            cur = _compact(cur)
            since_ckpt = 0
    return rows


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
