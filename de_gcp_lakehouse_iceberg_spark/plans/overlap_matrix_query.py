"""q108 — cross-source content-leakage matrix: pairwise trigram
overlap between every pair of the corpus's sources, estimated from
per-source KMV sketches and verified against the exact intersection.

The curation question this answers at 100 TB: "which sources share
content?" (mirror sites, scraped re-posts, common boilerplate) —
BEFORE committing to a quadratic cross-source dedup. The honest scale
path is the sketch: ONE corpus pass builds 20 sketches of ≤k longs
(`operators/sketches.kmv_sketch`), and the 190-pair overlap matrix is
pure array arithmetic on those sketches — the corpus is never joined
against itself. The exact pairwise intersection rides along at test
scale as the verification column (q82's estimate-vs-exact shape); r14
it derives from the same per-key source-set aggregation as everything
else (set size ≤ #sources), so the whole query runs ONE substantial
shuffle and zero self-joins.

Trigram keys are engine-portable integers: per-token key
(len·31 + first-codepoint, the `fingerprint` convention), folded into
a 3-token polynomial mod 2^31−1 as a FIXED 3-step expression — no
per-row loop, no string hashing divergence. Both the sketch (via the
portable `id_hash` family) and the estimator replay 1:1 in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.sketches import (
    kmv_hashes_sql,
    kmv_overlap,
    kmv_overlap_sql,
    kmv_sketch,
)
from ..tables import table
from .queries import register

_K = 64
_B = 1_000_003
_M = 2_147_483_647  # 2^31 − 1


def _trigram_keys(text):
    """array<long> of portable 3-token shingle keys (1 key per window;
    short docs degrade to their padded prefix — every doc ≥1 key).
    Expression form — the cross-engine equality anchor. Spark's
    higher-order lambdas are INTERPRETED, so the hot path is the
    bit-identical Arrow UDF below (same pattern as simhash_fast)."""
    keyed = F.transform(
        tokens(text), lambda w: (F.length(w) * 31 + F.ascii(w)).cast("long")
    )
    n = F.size(keyed)

    def _key(i):
        # try_element_at: out-of-range → NULL → 0 (short docs), like
        # DuckDB's plain list index in the oracle
        t1 = F.element_at(keyed, i)
        t2 = F.coalesce(
            F.try_element_at(keyed, i + 1), F.lit(0).cast("long")
        )
        t3 = F.coalesce(
            F.try_element_at(keyed, i + 2), F.lit(0).cast("long")
        )
        return ((t1 * _B + t2) % _M * _B + t3) % _M

    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))), _key
    )


def trigram_keys_fast():
    """Arrow-batched trigram keys, bit-identical to `_trigram_keys`
    (tests pin equality). r14: the per-window polynomial fold is now a
    vectorized int64 numpy pass over the whole batch (the old per-row
    Python loop did 4 bigint ops per window) — the `_window_keys_batch`
    pattern: per-token keys are laid out flat with two zero-pads after
    each document, so every document's windows read its own tokens and
    the out-of-range positions read the pad zeros, exactly the
    `coalesce(try_element_at(...), 0)` convention of the Column form.
    All intermediates stay < 2^52, so int64 numpy arithmetic is exact.
    Built lazily (the decorator parses its DDL return type against the
    active session — the repo-wide pandas_udf convention)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _udf(texts):
        import numpy as np
        import pandas as pd

        tok_lists = [s.split(" ") for s in texts]
        ndocs = len(tok_lists)
        counts = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=ndocs
        )
        total = int(counts.sum())
        flat = np.fromiter(
            (
                len(w) * 31 + (ord(w[0]) if w else 0)
                for t in tok_lists
                for w in t
            ),
            dtype=np.int64,
            count=total,
        )
        padded = np.zeros(total + 2 * ndocs, dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pstarts = np.concatenate(([0], np.cumsum(counts + 2)[:-1]))
        for i in range(ndocs):
            c = counts[i]
            padded[pstarts[i]: pstarts[i] + c] = flat[
                starts[i]: starts[i] + c
            ]
        g = padded[:-2] * _B
        np.add(g, padded[1:-1], out=g)
        np.remainder(g, _M, out=g)
        np.multiply(g, _B, out=g)
        np.add(g, padded[2:], out=g)
        np.remainder(g, _M, out=g)
        wcounts = np.maximum(counts - 2, 1)
        return pd.Series(
            [
                g[pstarts[i]: pstarts[i] + wcounts[i]]
                for i in range(ndocs)
            ]
        )

    return _udf


_TRIG_SQL = f"""(
  SELECT source, unnest(list_transform(
    generate_series(1, greatest(len(keyed) - 2, 1)),
    i -> ((keyed[i] * {_B} + COALESCE(keyed[i+1], 0)) % {_M} * {_B}
          + COALESCE(keyed[i+2], 0)) % {_M})) AS key
  FROM (SELECT source,
               list_transform(string_split(text, ' '),
                 w -> CAST(length(w) * 31 + ascii(w) AS BIGINT)) AS keyed
        FROM documents) kd)"""


@register(
    "q108_source_overlap_matrix",
    oracle=f"""
    WITH occ AS (SELECT source, key FROM {_TRIG_SQL} o),
    {kmv_hashes_sql("source", "key", "occ", _K, "sk")},
    ska AS (
      SELECT a.g || '|' || b.g AS g, a.hashes
      FROM sk a JOIN sk b ON a.g < b.g),
    skb AS (
      SELECT a.g || '|' || b.g AS g, b.hashes
      FROM sk a JOIN sk b ON a.g < b.g),
    {kmv_overlap_sql("ska", "skb", _K)},
    dk AS (SELECT DISTINCT source, key FROM occ),
    nd AS (SELECT source, CAST(count(*) AS BIGINT) AS c
           FROM dk GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS i
      FROM dk a JOIN dk b ON a.key = b.key AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT split_part(o.g, '|', 1) AS src_a,
           split_part(o.g, '|', 2) AS src_b,
           o.union_est, o.intersect_est,
           na.c + nb.c - COALESCE(i.i, 0) AS exact_union,
           COALESCE(i.i, 0) AS exact_intersect
    FROM overlap o
    JOIN nd na ON na.source = split_part(o.g, '|', 1)
    JOIN nd nb ON nb.source = split_part(o.g, '|', 2)
    LEFT JOIN inter i ON i.src_a = split_part(o.g, '|', 1)
                     AND i.src_b = split_part(o.g, '|', 2)
    ORDER BY src_a, src_b
    """,
)
def q108_source_overlap_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    occ = docs.select(
        "source", F.explode(trigram_keys_fast()(F.col("text"))).alias("key")
    )
    # ONE substantial shuffle for the whole query (r14, guide §2.4 —
    # interleaved A/B: 1.9 s vs 3.6 s for the old distinct+self-join
    # shape): occurrences aggregate straight to per-key source SETS
    # (collect_set dedups map-side, so the exchange carries partially
    # deduped rows; set size is bounded by #sources). Every downstream
    # branch derives from `ks` without touching the corpus again:
    # the distinct (source, key) pairs re-appear via explode (no
    # shuffle), per-source counts and KMV partial min-k's aggregate
    # map-side into tiny exchanges, and the exact pairwise
    # intersections expand each set into its sorted pairs (≤ C(#src,2)
    # structs per key) — the old dk ⋈ dk self-join shuffled the
    # distinct pairs twice more on top of the distinct itself.
    #
    # NOTE (r14 ADVICE): the localCheckpoint below makes building this
    # plan EAGER — a Spark job runs at construction time, and the
    # checkpointed blocks are freed only when the RDD is GC'd. That is
    # the intended shape for the bench/driver (the query function runs
    # inside the timed region and is re-built per run); a long-lived
    # session that builds-but-never-executes this plan still pays the
    # aggregation once.
    ks = occ.groupBy("key").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    # Materialize the per-key source sets ONCE: three branches (sketch,
    # per-source counts, exact intersections) consume `ks`, and while
    # ReusedExchange shares the shuffle files, the collect_set
    # aggregation itself re-ran per branch — at sf0.1 that tripled the
    # query's dominant aggregation (interleaved A/B min 7.9 s → 3.4 s,
    # rows identical). Same inter-stage materialization point q74 uses;
    # at 100 TB this is the standard write-once/read-thrice boundary.
    ks = ks.localCheckpoint()
    dk_all = ks.select(F.explode("ss").alias("source"), "key")
    sk = kmv_sketch(dk_all, ["source"], "key", k=_K)

    srcs = sk.select("source")
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .crossJoin(F.broadcast(srcs.select(F.col("source").alias("src_b"))))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    a_side = pairs.join(
        F.broadcast(sk.withColumnRenamed("source", "src_a")), "src_a"
    ).select("src_a", "src_b", "hashes")
    b_side = pairs.join(
        F.broadcast(sk.withColumnRenamed("source", "src_b")), "src_b"
    ).select("src_a", "src_b", "hashes")
    ov = kmv_overlap(a_side, b_side, ["src_a", "src_b"], k=_K)

    nd = dk_all.groupBy("source").agg(F.count("*").alias("c"))
    inter = (
        ks.filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (a, i) -> "
                    "transform(slice(ss, i + 2, size(ss) - i - 1), "
                    "b -> named_struct('src_a', a, 'src_b', b))))"
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.src_a").alias("src_a"),
            F.col("p.src_b").alias("src_b"),
        )
        .agg(F.count("*").alias("i"))
    )
    return (
        ov.join(
            F.broadcast(nd.withColumnRenamed("source", "src_a")
                        .withColumnRenamed("c", "ca")),
            "src_a",
        )
        .join(
            F.broadcast(nd.withColumnRenamed("source", "src_b")
                        .withColumnRenamed("c", "cb")),
            "src_b",
        )
        .join(inter, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "union_est",
            "intersect_est",
            (
                F.col("ca") + F.col("cb") - F.coalesce(F.col("i"), F.lit(0))
            ).alias("exact_union"),
            F.coalesce(F.col("i"), F.lit(0)).alias("exact_intersect"),
        )
        .orderBy("src_a", "src_b")
    )
