"""q108 — cross-source content-leakage matrix: pairwise trigram
overlap between every pair of the corpus's sources, estimated from
per-source KMV sketches and verified against the exact intersection.

The curation question this answers at 100 TB: "which sources share
content?" (mirror sites, scraped re-posts, common boilerplate) —
BEFORE committing to a quadratic cross-source dedup. The honest scale
path is the sketch: ONE corpus pass builds 20 sketches of ≤k longs
(`operators/sketches.kmv_sketch`), and the 190-pair overlap matrix is
pure array arithmetic on those sketches — the corpus is never joined
against itself. The exact pairwise intersection (a real key self-join)
rides along at test scale as the verification column, exactly like
q82's estimate-vs-exact shape.

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
    (tests pin equality). Python ints are exact, so the polynomial
    mod-arithmetic matches the JVM long path 1:1. Built lazily (the
    decorator parses its DDL return type against the active session —
    the repo-wide pandas_udf convention)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _udf(texts):
        import pandas as pd

        def one(s: str):
            toks = s.split(" ")
            keys = [
                len(w) * 31 + (ord(w[0]) if w else 0) for w in toks
            ]
            n = len(keys)
            out = []
            for i in range(max(n - 2, 1)):
                t1 = keys[i]
                t2 = keys[i + 1] if i + 1 < n else 0
                t3 = keys[i + 2] if i + 2 < n else 0
                out.append(((t1 * _B + t2) % _M * _B + t3) % _M)
            return out

        return pd.Series([one(s) for s in texts])

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
    # Everything downstream derives from the ONE distinct (source, key)
    # shuffle: KMV sketches only see distinct values anyway, so building
    # them from dk lets Catalyst reuse the exchange across the sketch,
    # per-source-count, and exact-intersection branches instead of
    # re-running the keying UDF per branch.
    dk_all = occ.distinct()
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

    dk = dk_all
    nd = dk.groupBy("source").agg(F.count("*").alias("c"))
    inter = (
        dk.select(F.col("source").alias("src_a"), "key")
        .join(dk.select(F.col("source").alias("src_b"), "key"), "key")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
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
