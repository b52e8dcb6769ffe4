"""Curation operators: as-of join semantics, benchmark contamination,
repetition ratio, token-budget selection."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.functions.text import repetition_ratio
from de_gcp_lakehouse_iceberg_spark.operators.asof import asof_join
from de_gcp_lakehouse_iceberg_spark.operators.corpus import (
    contamination_overlap,
    select_within_token_budget,
)


def _ts(minute: int, second: int = 0):
    return dt.datetime(2025, 1, 1, 12, minute, second)


def test_asof_join_backward_with_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts(0)),   # before any right row -> no match
            (2, 100, _ts(10)),  # matches right at 12:05
            (3, 100, _ts(30)),  # 12:05 is 25min ago -> inside 30min tol
            (4, 300, _ts(50)),  # key 300's only error is 45min ago -> expired
            (5, 200, _ts(10)),  # other key, no right rows at all
            (6, 100, _ts(40)),  # exact match at 12:40
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, _ts(5), 7.0), (100, _ts(40), 9.0), (300, _ts(5), 8.0)],
        "k long, rts timestamp, v double",
    )
    out = {
        r.id: (r.asof_rts, r.asof_v)
        for r in asof_join(
            left, right, by=["k"], left_ts="ts", right_ts="rts",
            tolerance_seconds=1800,
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts(5), 7.0)
    assert out[3] == (_ts(5), 7.0)
    assert out[4] == (None, None)          # tolerance expired
    assert out[5] == (None, None)          # key never seen on right
    assert out[6] == (_ts(40), 9.0)        # exact match allowed
    assert len(out) == 6                   # left-outer: every left row kept


def test_asof_join_payload_is_atomic(spark):
    """A right row with a NULL payload column must not inherit an older
    row's value for that column (whole-row carry, not per-column)."""
    left = spark.createDataFrame(
        [(1, 1, _ts(20))], "id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 7.0, "a"), (1, _ts(10), None, "b")],
        "k long, rts timestamp, v double, tag string",
    )
    row = asof_join(
        left, right, by=["k"], left_ts="ts", right_ts="rts"
    ).collect()[0]
    assert row.asof_tag == "b" and row.asof_v is None


def test_contamination_overlap_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),        # eval doc: shingles abc bcd cde def
            (1, "a b c d x y"),        # shares abc, bcd of its 4
            (2, "p q r s t u"),        # shares nothing
        ],
        "doc_id long, text string",
    )
    eval_ids = docs.filter(F.col("doc_id") == 0).select("doc_id")
    got = {
        r.doc_id: (r.n_shingles, r.eval_hits, round(r.overlap, 6))
        for r in contamination_overlap(docs, eval_ids).collect()
    }
    assert 0 not in got                    # eval docs excluded
    assert got[1] == (4, 2, 0.5)
    assert got[2] == (4, 0, 0.0)


def test_repetition_ratio_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: round(r.rep, 6)
        for r in df.select(
            "doc_id", repetition_ratio("text").alias("rep")
        ).collect()
    }
    # doc1: 7 trigrams, distinct {abc,bca,cab} = 3 -> 1 - 3/7
    assert got[1] == round(1 - 3 / 7, 6)
    assert got[2] == 0.0


def test_token_budget_selection_prefix(spark):
    # quality is monotone in token count up to 50 tokens, so longer docs
    # rank first; craft docs where the greedy prefix is obvious
    docs = spark.createDataFrame(
        [
            (1, "en", "w " * 39 + "w"),    # 40 tokens, highest quality
            (2, "en", "x " * 29 + "x"),    # 30 tokens
            (3, "en", "y " * 19 + "y"),    # 20 tokens — would overflow 75
            (4, "fr", "z " * 9 + "z"),     # other group, fits alone
        ],
        "doc_id long, lang string, text string",
    )
    sel = select_within_token_budget(docs, budget_tokens=75, group_col="lang")
    got = {(r.lang, r.doc_id): r.cum_tokens for r in sel.collect()}
    assert set(got) == {("en", 1), ("en", 2), ("fr", 4)}
    assert got[("en", 2)] == 70


def test_repetition_ratio_fast_equals_expression(spark, sf_dir):
    """The Arrow repetition ratio must equal the Column-expression form
    exactly (same integer sizes -> same doubles) on the fixture."""
    from pyspark.sql import functions as F

    from de_gcp_lakehouse_iceberg_spark.functions.text import (
        repetition_ratio,
    )
    from de_gcp_lakehouse_iceberg_spark.operators.dedup import (
        repetition_ratio_fast,
    )
    from de_gcp_lakehouse_iceberg_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    rows = docs.select(
        repetition_ratio("text", 3).alias("expr"),
        repetition_ratio_fast("text", 3).alias("arrow"),
    ).collect()
    assert rows and all(r["expr"] == r["arrow"] for r in rows)
    # short-doc convention: < n tokens still yields one shingle
    tiny = spark.createDataFrame([("one two",), ("x",)], "text string")
    t = tiny.select(
        repetition_ratio("text", 3).alias("expr"),
        repetition_ratio_fast("text", 3).alias("arrow"),
    ).collect()
    assert all(r["expr"] == r["arrow"] for r in t)
