"""q86/q87 — corpus-statistics LM quality scoring and mergeable
histogram quantiles, hash-gated end to end.

q86 — unigram language-model score (the CCNet-style perplexity-filter
stand-in: no model weights in this container, but the pipeline shape —
global vocabulary statistics → per-token log-prob → per-doc aggregate
→ per-language rollup — is the real one). Per-token log2 p(t|lang) is
6dp-quantized and per-doc sums are exact decimals, so every double is
order-independent and engine-portable.

q87 — fixed-grid histogram quantile sketch: p50/p95 of events.value
per event type from 50 equi-width bin counters over [0, 500). Counters
merge by addition (tested); the estimator is deterministic linear
interpolation — unlike t-digest/KLL there is no randomized compaction,
which is exactly what makes it oracle-checkable. Exact percentile
(q15's operator) remains the precise form; this is the
one-pass/mergeable form a 100 TB rollup table stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import unigram_doc_scores
from ..operators.sketches import hist_quantile, hist_quantile_sql, hist_sketch
from ..tables import table
from .queries import register

_LO, _HI, _BINS = 0.0, 500.0, 50


@register(
    "q86_unigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
      FROM documents),
    counts AS (
      SELECT lang, t, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY lang, t),
    totals AS (
      SELECT lang, sum(c) AS n FROM counts GROUP BY lang),
    lp AS (
      SELECT counts.lang, t,
             floor(log2(CAST(c AS DOUBLE) / n) * 1000000 + 0.5) / 1000000
               AS lp_q
      FROM counts JOIN totals ON counts.lang = totals.lang),
    per_doc AS (
      SELECT toks.doc_id, toks.lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             floor(CAST(sum(CAST(lp_q AS DECIMAL(28,6))) AS DOUBLE)
                   / count(*) * 1000000 + 0.5) / 1000000 AS score
      FROM toks JOIN lp ON toks.lang = lp.lang AND toks.t = lp.t
      GROUP BY toks.doc_id, toks.lang)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           floor(CAST(sum(CAST(score AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS avg_score,
           min(score) AS worst_score,
           CAST(count(*) FILTER (WHERE score < -9.0) AS BIGINT)
             AS n_low_quality
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def q86_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = unigram_doc_scores(docs)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.floor(
                    F.sum(F.col("score").cast("decimal(28,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 10_000
                    + F.lit(0.5)
                )
                / 10_000
            ).alias("avg_score"),
            F.min("score").alias("worst_score"),
            F.count_if(F.col("score") < -9.0).alias("n_low_quality"),
        )
        .orderBy("lang")
    )


@register(
    "q87_hist_quantiles",
    oracle=f"""
    WITH {hist_quantile_sql("event_type", "value", "events",
                            0.5, _LO, _HI, _BINS, "p50")},
    {hist_quantile_sql("event_type", "value", "events",
                       0.95, _LO, _HI, _BINS, "p95")}
    SELECT p50.g AS event_type,
           p50.est AS p50_est,
           p95.est AS p95_est,
           CAST((SELECT count(*) FROM events e WHERE e.event_type = p50.g)
                AS BIGINT) AS n
    FROM p50 JOIN p95 ON p50.g = p95.g
    ORDER BY event_type
    """,
)
def q87_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    sk = hist_sketch(events, ["event_type"], "value", _LO, _HI, _BINS)
    # the sketch feeds BOTH quantiles (and the count) — a few hundred
    # counter rows; localCheckpoint releases the full-scan lineage
    sk = sk.localCheckpoint()
    p50 = hist_quantile(sk, ["event_type"], 0.5, _LO, _HI, _BINS)
    p95 = hist_quantile(sk, ["event_type"], 0.95, _LO, _HI, _BINS)
    n = sk.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    return (
        p50.withColumnRenamed("est", "p50_est")
        .join(p95.withColumnRenamed("est", "p95_est"), "event_type")
        .join(n, "event_type")
        .select("event_type", "p50_est", "p95_est", "n")
        .orderBy("event_type")
    )
