"""q54-q57 — corpus-curation operators as driver-gated queries:
benchmark decontamination, repetition filtering, as-of joins, and
token-budget data selection. Each oracle rebuilds the full pipeline in
DuckDB SQL from the same constants, so the driver hash-verifies the
whole operator, not a proxy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.dedup import repetition_ratio_fast
from ..operators.corpus import contamination_overlap, select_within_token_budget
from ..tables import table
from .dedup_queries import _SHINGLE_SQL
from .queries import _r, register
from .text_queries import _QUALITY_SQL_EXPR

# deterministic benchmark stand-in: every 97th doc is the "eval set"
_EVAL_MOD = 97
_CONTAM_T = 0.3
_TOKEN_BUDGET = 2000


# --------------------------------------------------------------------------
# q54 — benchmark decontamination: share of each training doc's distinct
# shingles that appear anywhere in the (broadcast) benchmark shingle set;
# per-lang contamination census.
# --------------------------------------------------------------------------
@register(
    "q54_contamination",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    eval_sh AS (
      SELECT DISTINCT s FROM ex WHERE ex.doc_id % {_EVAL_MOD} = 0),
    train AS (SELECT * FROM ex WHERE ex.doc_id % {_EVAL_MOD} <> 0),
    per_doc AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(count(*) FILTER (WHERE t.s IN (SELECT s FROM eval_sh))
                  AS BIGINT) AS eval_hits
      FROM train t GROUP BY t.doc_id)
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS train_docs,
           CAST(count(*) FILTER (
             WHERE CAST(p.eval_hits AS DOUBLE) / p.n_shingles
                   >= {_CONTAM_T}) AS BIGINT) AS contaminated_docs,
           floor(CAST(sum(CAST(p.eval_hits AS DOUBLE) / p.n_shingles)
                 AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
             AS avg_overlap
    FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def q54_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    eval_ids = docs.filter(F.col("doc_id") % _EVAL_MOD == 0).select("doc_id")
    overlap = contamination_overlap(docs, eval_ids)
    return (
        overlap.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("train_docs"),
            F.count_if(F.col("overlap") >= _CONTAM_T).alias(
                "contaminated_docs"
            ),
            _r(F.sum("overlap") / F.count("*"), 6).alias("avg_overlap"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q55 — repetition filter (duplicate-trigram ratio, the Gopher-style
# rule): per-source census of docs over the repetition threshold.
# --------------------------------------------------------------------------
_REP_T = 0.2

@register(
    "q55_repetition_filter",
    oracle=f"""
    WITH rep AS (
      SELECT doc_id, source,
             1.0 - CAST(len(list_distinct(all_sh)) AS DOUBLE)
                   / len(all_sh) AS rep_ratio
      FROM (
        SELECT d.doc_id, d.source,
               list_transform(
                 range(0, greatest(len(string_split(d.text,' ')) - 2, 1)),
                 i -> array_to_string(
                   list_slice(string_split(d.text,' '), i + 1, i + 3), ' ')
               ) AS all_sh
        FROM documents d))
    SELECT source,
           CAST(count(*) AS BIGINT) AS doc_count,
           CAST(count(*) FILTER (WHERE rep_ratio > {_REP_T}) AS BIGINT)
             AS repetitive_docs,
           floor(CAST(sum(rep_ratio) AS DOUBLE) / count(*) * 1000000 + 0.5)
             / 1000000 AS avg_repetition
    FROM rep
    GROUP BY source
    ORDER BY source
    """,
)
def q55_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    rep = docs.select(
        "source", repetition_ratio_fast("text", 3).alias("rep_ratio")
    )
    return (
        rep.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            F.count_if(F.col("rep_ratio") > _REP_T).alias("repetitive_docs"),
            _r(F.sum("rep_ratio") / F.count("*"), 6).alias("avg_repetition"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q56 — as-of join: every non-error event picks up the most recent prior
# error of the same user (backward, exact-match allowed, 30 min
# tolerance); per-type census of events inside an error window. The
# oracle reproduces the as-of with a running-max window — equivalent
# because ts is monotone within the window ordering.
# --------------------------------------------------------------------------
_ASOF_TOL_S = 1800

@register(
    "q56_asof_error_context",
    oracle=f"""
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'error' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS last_err_ts
      FROM events),
    base AS (
      SELECT event_type,
             CASE WHEN last_err_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(last_err_ts)
                       <= {_ASOF_TOL_S} * 1000000
                  THEN epoch_us(ts) - epoch_us(last_err_ts) END AS gap_us
      FROM tagged WHERE event_type <> 'error')
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS events,
           CAST(count(gap_us) AS BIGINT) AS after_recent_error,
           floor(CAST(sum(gap_us / 1000000.0) AS DOUBLE)
                 / count(gap_us) * 100 + 0.5) / 100 AS avg_gap_s
    FROM base
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q56_asof_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id")
    )
    rest = events.filter(F.col("event_type") != "error")
    joined = asof_join(
        rest,
        errors,
        by=["user_id"],
        left_ts="ts",
        right_ts="err_ts",
        right_cols=[],
        tolerance_seconds=_ASOF_TOL_S,
    )
    gap_s = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_err_ts"))
    ) / 1_000_000.0
    return (
        joined.select("event_type", gap_s.alias("gap_s"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("events"),
            F.count("gap_s").alias("after_recent_error"),
            _r(F.sum("gap_s") / F.count("gap_s"), 2).alias("avg_gap_s"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q57 — token-budget data selection: greedy-by-quality prefix per lang
# under a fixed token budget.
# --------------------------------------------------------------------------
@register(
    "q57_token_budget_selection",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             {_QUALITY_SQL_EXPR} AS quality
      FROM documents),
    ranked AS (
      SELECT *,
             sum(n_tokens) OVER (PARTITION BY lang
                                 ORDER BY quality DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM scored)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS selected_docs,
           CAST(sum(n_tokens) AS BIGINT) AS selected_tokens,
           floor(min(quality) * 1000000 + 0.5) / 1000000 AS min_quality
    FROM ranked
    WHERE cum_tokens <= {_TOKEN_BUDGET}
    GROUP BY lang
    ORDER BY lang
    """,
)
def q57_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sel = select_within_token_budget(docs, _TOKEN_BUDGET, group_col="lang")
    return (
        sel.groupBy("lang")
        .agg(
            F.count("*").alias("selected_docs"),
            F.sum("n_tokens").alias("selected_tokens"),
            _r(F.min("quality"), 6).alias("min_quality"),
        )
        .orderBy("lang")
    )
