"""Bloom semi-join pre-filter (operators/bloomjoin.py) and two-phase
grouped top-k (operators/topk.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators.bloomjoin import (
    bloom_filter_words,
    bloom_probe_filter,
    bloom_semi_join,
)
from de_gcp_lakehouse_iceberg_spark.operators.topk import grouped_topk


def test_bloom_semi_join_equals_exact_semi_join(spark):
    big = spark.range(0, 5000).select(
        F.col("id").alias("key"), (F.col("id") * 3).alias("v")
    )
    small = spark.range(0, 5000, 37).select(F.col("id").alias("key"))
    got = bloom_semi_join(big, small, "key", bits=1 << 10, k=5)
    want = big.join(small, "key", "left_semi")
    assert sorted(r.key for r in got.collect()) == sorted(
        r.key for r in want.collect()
    )


def test_bloom_semi_join_string_and_negative_keys(spark):
    big = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "key string"
    )
    small = spark.createDataFrame([("b",), ("d",), ("zz",)], "key string")
    got = {r.key for r in bloom_semi_join(big, small, "key").collect()}
    assert got == {"b", "d"}

    bign = spark.createDataFrame(
        [(-5,), (3,), (-1000000007,), (8,)], "key long"
    )
    smalln = spark.createDataFrame([(-5,), (8,)], "key long")
    gotn = {r.key for r in bloom_semi_join(bign, smalln, "key").collect()}
    assert gotn == {-5, 8}


def test_bloom_build_tolerates_null_keys_in_small_side(spark):
    """A NULL key in the DIM side must be ignored (it can never match
    an equi-join), not ride through as NULL positions and crash the
    bitset fold."""
    big = spark.createDataFrame([(1,), (2,), (None,), (3,)], "key long")
    small = spark.createDataFrame([(2,), (None,), (3,)], "key long")
    got = sorted(
        r.key for r in bloom_semi_join(big, small, "key").collect()
    )
    assert got == [2, 3]
    # string keys too
    bigs = spark.createDataFrame([("a",), (None,), ("b",)], "key string")
    smalls = spark.createDataFrame([("b",), (None,)], "key string")
    gots = sorted(
        r.key for r in bloom_semi_join(bigs, smalls, "key").collect()
    )
    assert gots == ["b"]


def test_bloom_probe_never_false_negative(spark):
    """Every small-side key must survive the probe filter (the exact
    join only ever REMOVES false positives)."""
    small = spark.range(0, 400, 7).select(F.col("id").alias("key"))
    words = bloom_filter_words(small, "key", bits=256, k=5)  # tiny → FPs
    kept = bloom_probe_filter(
        spark.range(0, 400).select(F.col("id").alias("key")),
        "key", words, bits=256, k=5,
    )
    kept_keys = {r.key for r in kept.collect()}
    assert set(range(0, 400, 7)) <= kept_keys


def test_bloom_probe_is_scan_stage_no_join(spark):
    """The probe is a pure Column filter: the pre-filter plan contains
    NO join and NO exchange — it runs inside the scan stage."""
    small = spark.range(0, 100, 9).select(F.col("id").alias("key"))
    words = bloom_filter_words(small, "key")
    pre = bloom_probe_filter(
        spark.range(10_000).select(F.col("id").alias("key")), "key", words
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_grouped_topk_equals_window_form(spark):
    import random

    rng = random.Random(11)
    rows = [
        (f"g{i % 5}", rng.randrange(1000), i) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "g string, score long, id long")
    got = grouped_topk(
        df, ["g"], [(-F.col("score")), F.col("id")], k=7
    ).collect()
    from pyspark.sql import Window as W

    w = W.partitionBy("g").orderBy(F.col("score").desc(), F.col("id"))
    want = (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
        .collect()
    )
    key = lambda r: (r.g, r.rank, r.id, r.score)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))


def test_grouped_topk_small_groups_and_plan(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 9, 3)], "g string, score long, id long"
    )
    out = grouped_topk(df, ["g"], [F.col("score"), F.col("id")], k=5)
    rows = {(r.g, r.rank): r.score for r in out.collect()}
    assert rows == {("a", 1): 1, ("a", 2): 2, ("b", 1): 9}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan            # two-phase, no global sort
    assert "partial_collect_list" in plan  # map-side combine


def test_auto_bits_tracks_key_count():
    from de_gcp_lakehouse_iceberg_spark.operators.bloomjoin import (
        DEFAULT_BITS,
        MAX_AUTO_BITS,
        auto_bits,
    )

    assert auto_bits(0) == DEFAULT_BITS
    assert auto_bits(5_000) == DEFAULT_BITS  # ~13 bits/key already
    assert auto_bits(12_000) == DEFAULT_BITS * 2  # the sf3 regime
    assert auto_bits(10**9) == MAX_AUTO_BITS  # capped: literal stays sane
    # always a multiple of 64 (bitset words)
    for n in (0, 1, 7_000, 50_000):
        assert auto_bits(n) % 64 == 0


def test_arrow_probe_equals_expression_probe(spark):
    """The numpy fast-path probe must keep EXACTLY the rows the
    expression-form probe keeps (same double-hash integers), including
    negative keys and NULLs (both drop NULL keys)."""
    from de_gcp_lakehouse_iceberg_spark.operators.bloomjoin import (
        bloom_filter_words,
        bloom_probe_filter,
    )

    big = spark.createDataFrame(
        [(i,) for i in range(-500, 500)] + [(None,)], "key long"
    )
    small = spark.createDataFrame(
        [(i,) for i in range(-50, 50, 7)], "key long"
    )
    bits, k = 1 << 10, 5
    words = bloom_filter_words(small, "key", bits, k)
    fast = {
        r["key"]
        for r in bloom_probe_filter(
            big, "key", words, bits, k, arrow=True
        ).collect()
    }
    expr = {
        r["key"]
        for r in bloom_probe_filter(
            big, "key", words, bits, k, arrow=False
        ).collect()
    }
    assert fast == expr
    assert None not in fast
    # no false negatives on either path
    assert {r["key"] for r in small.collect()} <= fast


def test_arrow_probe_large_keys_with_nulls_in_batch(spark):
    """|key| > 2^53 with NULLs in the SAME Arrow batch: a nullable int64
    batch converts to float64 pandas, which rounds 2^53+1 → 2^53 and
    hashes a DIFFERENT value than the build side — a bloom false
    negative (silently dropped matching row). The probe must keep the
    key exact. Single partition forces everything into one batch."""
    from de_gcp_lakehouse_iceberg_spark.operators.bloomjoin import (
        bloom_filter_words,
        bloom_probe_filter,
        bloom_semi_join,
    )

    base = 1 << 60
    keys = [base + 1, base + 2, base + 3, -(base + 7), (1 << 53) + 1]
    big = spark.createDataFrame(
        [(k,) for k in keys] + [(None,), (0,)], "key long"
    ).coalesce(1)
    small = spark.createDataFrame(
        [(base + 1,), (-(base + 7),), ((1 << 53) + 1,)], "key long"
    )
    bits, k = 1 << 12, 5
    words = bloom_filter_words(small, "key", bits, k)
    fast = {
        r["key"]
        for r in bloom_probe_filter(
            big, "key", words, bits, k, arrow=True
        ).collect()
    }
    expr = {
        r["key"]
        for r in bloom_probe_filter(
            big, "key", words, bits, k, arrow=False
        ).collect()
    }
    assert fast == expr
    assert None not in fast
    assert {base + 1, -(base + 7), (1 << 53) + 1} <= fast
    # end-to-end: the semi-join (default arrow=True) returns exactly
    # the matching large keys
    got = {r.key for r in bloom_semi_join(big, small, "key").collect()}
    assert got == {base + 1, -(base + 7), (1 << 53) + 1}


def _window_topk(df, k):
    from pyspark.sql import Window as W

    w = W.partitionBy("g").orderBy(F.col("score").desc(), F.col("id"))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )


def test_grouped_topk_routes_agree_with_window(spark):
    """Every route (bounded-carry, bounded-rejoin, single) returns
    exactly the window form's rows — same winners, same ranks."""
    import random

    rng = random.Random(29)
    rows = [(f"g{i % 7}", rng.randrange(500), i) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, score long, id long")
    want = sorted(
        (r.g, r.rank, r.id, r.score) for r in _window_topk(df, 6)
    )
    for kw in (
        {"payload": "carry"},
        {"payload": "rejoin"},
        {"route": "single"},
    ):
        got = grouped_topk(
            df, ["g"], [(-F.col("score")), F.col("id")], k=6, **kw
        ).collect()
        assert sorted((r.g, r.rank, r.id, r.score) for r in got) == want, kw


def test_grouped_topk_null_order_keys_rank_first(spark):
    """SQL NULLS-FIRST parity between the Arrow partial and the JVM
    merge: a NULL order key wins over any value on every route."""
    rows = [("a", None, 1), ("a", 5, 2), ("a", 1, 3), ("b", 2, 4)]
    df = spark.createDataFrame(rows, "g string, score int, id long")
    for kw in ({}, {"payload": "rejoin"}, {"route": "single"}):
        got = {
            (r.g, r.rank): r.id
            for r in grouped_topk(
                df, ["g"], [F.col("score"), F.col("id")], k=2, **kw
            ).collect()
        }
        assert got == {("a", 1): 1, ("a", 2): 3, ("b", 1): 4}, kw


def test_grouped_topk_carries_unorderable_map_payload(spark):
    """Map-typed payload columns are carried, never compared (the r10
    ADVICE regression: packing them into the sort struct raised
    AnalysisException)."""
    df = spark.createDataFrame(
        [("a", 3, {"x": 1}), ("a", 1, {"y": 2}), ("b", 9, {"z": 3})],
        "g string, score int, m map<string,int>",
    )
    for kw in ({}, {"route": "single"}):
        got = grouped_topk(
            df, ["g"], [F.col("score")], k=1, **kw
        ).collect()
        rows = {(r.g): (r.rank, r.score, dict(r.m)) for r in got}
        assert rows == {"a": (1, 1, {"y": 2}), "b": (1, 9, {"z": 3})}, kw


def test_grouped_topk_null_group_keys_survive(spark):
    """A NULL group key is a real group on the bounded route (pandas
    groupby must not drop it) and on rejoin (null-safe join-back)."""
    df = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 11), ("a", 3, 12)],
        "g string, score int, id long",
    )
    for kw in ({}, {"payload": "rejoin"}, {"route": "single"}):
        got = grouped_topk(
            df, ["g"], [F.col("score"), F.col("id")], k=1, **kw
        ).collect()
        rows = {r.g: (r.rank, r.id) for r in got}
        assert rows == {None: (1, 10), "a": (1, 12)}, kw
