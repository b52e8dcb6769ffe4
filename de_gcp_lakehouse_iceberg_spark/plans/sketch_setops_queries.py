"""q82/q83 — mergeable-sketch set operations and frequency estimation,
hash-gated END TO END (the sketch arithmetic itself, not just row
counts, is inside the driver's value hash — both engines compute the
identical integers from the portable hash families).

q82 — KMV set operations (Beyer et al. 2007): audience overlap between
the click and purchase user sets from their k-min-values sketches
alone — union estimate from the merged min-k, intersection via the
Jaccard fraction of shared hashes — alongside the exact distinct
counts. At 100 TB the two sketches are 64 longs each; the overlap math
never rescans the events.

q83 — count-min sketch (Cormode & Muthukrishnan 2005): token
frequencies over the documents corpus estimated from a depth x width
counter table (3 x 512 cells — a few KB regardless of corpus size) for
a FIXED probe vocabulary (stopwords + language markers: deterministic,
collation-free), alongside exact counts. Count-min only ever
OVERESTIMATES; the oracle recomputes the same counters."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import LANG_MARKERS, STOPWORDS, tokens
from ..operators.sketches import (
    cm_lookup,
    cm_sketch,
    cm_sql,
    kmv_hashes_sql,
    kmv_overlap,
    kmv_overlap_sql,
)
from ..tables import table
from .queries import register

_K = 64
_W, _D = 512, 3

_PROBES = sorted(set(STOPWORDS) | {w for ws in LANG_MARKERS.values() for w in ws})


@register(
    "q82_kmv_overlap",
    oracle=f"""
    WITH {kmv_hashes_sql(
        "1", "user_id",
        "(SELECT user_id FROM events WHERE event_type = 'click')",
        _K, "ska")},
    {kmv_hashes_sql(
        "1", "user_id",
        "(SELECT user_id FROM events WHERE event_type = 'purchase')",
        _K, "skb")},
    {kmv_overlap_sql("ska", "skb", _K)},
    exact AS (
      SELECT
        (SELECT count(DISTINCT user_id) FROM events
         WHERE event_type IN ('click', 'purchase')) AS exact_union,
        (SELECT count(*) FROM
          (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
           INTERSECT
           SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase')) AS exact_intersect)
    SELECT CAST(o.union_est AS BIGINT) AS union_est,
           CAST(o.intersect_est AS BIGINT) AS intersect_est,
           CAST(e.exact_union AS BIGINT) AS exact_union,
           CAST(e.exact_intersect AS BIGINT) AS exact_intersect
    FROM overlap o, exact e
    """,
)
def q82_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_sketch

    events = table(spark, sf_dir, "events")
    one = F.lit(1).alias("g")

    def _sk(etype: str) -> DataFrame:
        return kmv_sketch(
            events.filter(F.col("event_type") == etype).select(
                one, "user_id"
            ),
            ["g"],
            "user_id",
            k=_K,
        )

    ov = kmv_overlap(_sk("click"), _sk("purchase"), ["g"], k=_K)
    exact = events.filter(
        F.col("event_type").isin("click", "purchase")
    ).agg(
        F.countDistinct("user_id").alias("exact_union"),
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("_c"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("_p"),
    ).select(
        "exact_union",
        (F.col("_c") + F.col("_p") - F.col("exact_union")).alias(
            "exact_intersect"
        ),
    )
    return ov.drop("g").crossJoin(exact).select(
        "union_est", "intersect_est", "exact_union", "exact_intersect"
    )


@register(
    "q83_cm_token_freq",
    oracle=f"""
    WITH toks_all AS (
      SELECT unnest(string_split(text, ' ')) AS v FROM documents),
    toks_probes AS (
      SELECT unnest([{", ".join(repr(w) for w in _PROBES)}]) AS v),
    {cm_sql("toks", _W, _D)},
    exact AS (
      SELECT p.v, CAST(count(t.v) AS BIGINT) AS exact_cnt
      FROM toks_probes p LEFT JOIN toks_all t ON t.v = p.v
      GROUP BY p.v)
    SELECT e.v AS token, e.exact_cnt, c.cm_est
    FROM exact e JOIN cm_est c ON e.v = c.v
    ORDER BY token
    """,
)
def q83_cm_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("v"))
    sk = cm_sketch(toks, "v", width=_W, depth=_D, is_string=True)
    probes = docs.sparkSession.createDataFrame(
        [(w,) for w in _PROBES], "v string"
    )
    est = cm_lookup(sk, probes, "v", width=_W, depth=_D, is_string=True)
    exact = (
        probes.join(toks, "v", "left")
        .groupBy("v")
        .agg(F.count(toks["v"]).alias("exact_cnt"))
    )
    return (
        exact.join(est, "v")
        .select(F.col("v").alias("token"), "exact_cnt", "cm_est")
        .orderBy("token")
    )
