"""Round-15 optimization equivalence pins: the projected WEIGHTED
changelog feed (dml.changelog(columns=...)) against the full-width
feed, IVM refresh exactness under projection-induced cancellation, the
non-deterministic-text fast-path guard, clustered-append manifest
parity with the sequential loop form, and collision-free net-diff
helper columns."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml
from de_gcp_lakehouse_iceberg_spark.lakehouse.ivm import IncrementalRollup


def _lifecycle(spark, root):
    """delete-fast-path + replayable-UPDATE + append window whose
    update projection (g, v) cancels across rows (v+1 collides with
    other rows' v), exercising every weighted-feed branch."""
    t = LakeTable.create(spark, str(root))
    base = spark.range(60).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 7).cast("double").alias("v"),
        (F.col("id") % 3).alias("z"),
    )
    t.append(base)
    v0 = t.current_version()
    dml.delete(t, "k % 11 = 3")
    dml.update(t, {"v": "v + 1.0"}, "k % 4 = 1")
    t.append(
        spark.range(60, 80).select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("g"),
            (F.col("id") % 7).cast("double").alias("v"),
            (F.col("id") % 3).alias("z"),
        )
    )
    return t, v0


def test_projected_weighted_feed_nets_match_full(spark, tmp_path):
    """Per projected value and commit, the weighted feed's signed net
    (Σ sign·_n) must equal the full-width feed's signed net — the
    abelian-delta contract — and Σ_gross must equal the full feed's
    physical row count whenever no two FULL rows cancelled (true here:
    k is unique and v+1.0 never maps a row to itself)."""
    t, v0 = _lifecycle(spark, tmp_path / "t")
    full = dml.changelog(t, v0, t.current_version())
    proj = dml.changelog(
        t, v0, t.current_version(), columns=["g", "v"]
    )
    assert set(proj.columns) == {
        "g", "v", "_change_type", "_change_version",
        "_change_timestamp", "_n", "_gross",
    }
    sgn = F.when(F.col("_change_type") == "INSERT", 1).otherwise(-1)
    want = {
        (r["g"], r["v"], r["_change_version"]): r["n"]
        for r in full.groupBy("g", "v", "_change_version")
        .agg(F.sum(sgn).alias("n"))
        .collect()
        if r["n"] != 0
    }
    got = {
        (r["g"], r["v"], r["_change_version"]): r["n"]
        for r in proj.groupBy("g", "v", "_change_version")
        .agg(F.sum(sgn * F.col("_n")).alias("n"))
        .collect()
        if r["n"] != 0
    }
    assert got == want
    assert proj.agg(F.sum("_gross")).first()[0] == full.count()
    # the update's projection genuinely cancelled something, otherwise
    # this test pins nothing: some value must ride with _n = 0
    assert proj.filter("_n = 0").count() > 0


def test_ivm_projected_refresh_equals_bootstrap(spark, tmp_path):
    """Refresh through the projected weighted feed must equal a
    from-scratch rollup of the final base — including minmax + KMV
    sketches — even when a window commit touches ONLY a column outside
    the projection (its whole diff cancels to _n = 0 rows) and another
    rewrites the distinct column (sketch eviction recompute)."""
    base = LakeTable.create(spark, str(tmp_path / "b"))
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 13).cast("double").alias("v"),
        (F.col("id") % 9).alias("d"),
        (F.col("id") % 4).alias("z"),
    )
    base.append(mk(0, 200))
    ru = IncrementalRollup.create(
        spark,
        str(tmp_path / "ru"),
        base,
        group_cols=["g"],
        sum_cols=["v"],
        minmax_cols=["v"],
        distinct_cols=["d"],
        kmv_k=8,
    )
    # commit whose projection to (g, v, d) is a total no-op
    dml.update(base, {"z": "z + 100"}, "k % 3 = 0")
    dml.delete(base, "k % 10 = 0")  # hits v extrema and d sketch slots
    dml.update(base, {"d": "d + 50"}, "k % 7 = 2")  # sketch eviction
    base.append(mk(200, 230))
    res = ru.refresh()
    assert res["mode"] == "delta" and res["delta_rows"] > 0

    fresh = IncrementalRollup.create(
        spark,
        str(tmp_path / "ru_fresh"),
        base,
        group_cols=["g"],
        sum_cols=["v"],
        minmax_cols=["v"],
        distinct_cols=["d"],
        kmv_k=8,
    )
    key = lambda r: (  # noqa: E731
        r["g"], r["cnt"], float(r["sum_v"]), float(r["min_v"]),
        float(r["max_v"]), r["distinct_d"],
    )
    got = sorted(key(r) for r in ru.df().collect())
    want = sorted(key(r) for r in fresh.df().collect())
    assert got == want


def test_nondeterministic_text_skips_fast_paths(spark, tmp_path):
    """A recorded predicate/assignment calling a non-deterministic
    function must NOT record the changelog replay fast path (r14
    VERDICT #6): replaying the text later would produce different
    values than the DML wrote."""
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    dml.update(t, {"v": "v + rand()"}, "k % 2 = 0")
    assert not t.snapshot().summary.get("assignments"), (
        "rand() assignment must fall back to the generic diff"
    )
    dml.delete(t, "rand() < 2.0")  # always true, but non-deterministic
    assert not t.snapshot().summary.get("predicate"), (
        "rand() predicate must not be recorded for delete replay"
    )
    # deterministic text still records the fast paths
    t2 = LakeTable.create(spark, str(tmp_path / "t2"))
    t2.append(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    dml.update(t2, {"v": "v + 1.0"}, "k % 2 = 0")
    assert t2.snapshot().summary.get("assignments")
    dml.delete(t2, "k % 3 = 0")
    assert t2.snapshot().summary.get("predicate")


def test_net_diff_feed_survives_reserved_column_names(spark):
    """User tables may legitimately carry columns named _sgn/_net —
    the fused diff derives collision-free helper names (r14 ADVICE)."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import (
        _net_diff_feed,
        _net_diff_feed_weighted,
    )

    plus = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 20)], "_sgn int, _net int"
    )
    minus = spark.createDataFrame([(1, 10), (3, 30)], "_sgn int, _net int")
    rows = sorted(
        (r["_sgn"], r["_net"], r["_change_type"])
        for r in _net_diff_feed(plus, minus, 1, 0).collect()
    )
    assert rows == [(1, 10, "INSERT"), (2, 20, "INSERT"), (3, 30, "DELETE")]
    w = {
        (r["_sgn"], r["_net"]): (r["_change_type"], r["_n"], r["_gross"])
        for r in _net_diff_feed_weighted(plus, minus, 1, 0).collect()
    }
    assert w[(1, 10)] == ("INSERT", 1, 3)
    assert w[(2, 20)] == ("INSERT", 1, 1)
    assert w[(3, 30)] == ("DELETE", 1, 1)


def test_append_clustered_manifest_parity_with_loop(spark, tmp_path):
    """append_clustered's manifest entries carry NO shadow cluster key
    and match the sequential per-band loop's entries field-for-field
    (rows, partition, footer stats) — r14 VERDICT #7."""
    df = spark.range(40).select(
        (F.col("id") % 4).alias("band"), F.col("id").alias("x")
    )
    loop_t = LakeTable.create(spark, str(tmp_path / "loop"))
    for b in range(4):
        loop_t.append(df.filter(F.col("band") == b).coalesce(1))
    cl_t = LakeTable.create(spark, str(tmp_path / "cl"))
    cl_t.append_clustered(df, "band", 4)

    cl_files = cl_t.snapshot().files
    loop_files = loop_t.snapshot().files
    assert len(cl_files) == len(loop_files) == 4
    for e in cl_files:
        assert e.partition == {}, (
            f"shadow cluster key leaked into the manifest: {e.partition}"
        )
    key = lambda e: (  # noqa: E731
        e.rows, json.dumps(e.partition, sort_keys=True),
        json.dumps(e.stats, sort_keys=True),
    )
    assert sorted(key(e) for e in cl_files) == sorted(
        key(e) for e in loop_files
    )
    # and the data is identical
    assert sorted(
        tuple(r) for r in cl_t.scan().collect()
    ) == sorted(tuple(r) for r in loop_t.scan().collect())


def test_bpe_driver_route_equals_distributed(spark):
    """The size-gated driver-side sequential merge loop must return
    the exact rows of the distributed incremental learner (and both
    the r14 full-recount semantics, via the existing reference-replay
    pins in test_bpe.py)."""
    from de_gcp_lakehouse_iceberg_spark.operators.bpe import bpe_learn

    docs = spark.createDataFrame(
        [
            ("low low lower lowest",),
            ("new newer newest low",),
            ("wider wide widest new new",),
            ("a ab abc abcd abcd ab",),
        ],
        "text string",
    )
    local = [
        tuple(r)
        for r in bpe_learn(spark, docs, n_merges=6).collect()
    ]
    dist = [
        tuple(r)
        for r in bpe_learn(
            spark, docs, n_merges=6, driver_vocab_max=0
        ).collect()
    ]
    assert local == dist and len(local) == 6
    # exhausting every pair must terminate identically on both routes
    tiny = spark.createDataFrame([("ab ab",)], "text string")
    a = [tuple(r) for r in bpe_learn(spark, tiny, n_merges=10).collect()]
    b = [
        tuple(r)
        for r in bpe_learn(
            spark, tiny, n_merges=10, driver_vocab_max=0
        ).collect()
    ]
    assert a == b


def test_audit_staged_rows_matches_scan_staged_count(spark, tmp_path):
    """The footer-level WAP audit must return exactly what a full
    re-scan of the staged rows counts — and still catch a damaged
    stage (a staged file truncated after the write fails the fresh
    footer read instead of silently passing)."""
    import os

    import pytest

    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(spark.range(10).selectExpr("id AS k", "id * 2 AS v"))
    staged_df = spark.range(100, 137).selectExpr("id AS k", "id AS v")
    wap_id = t.stage_append(staged_df.repartition(6))
    assert t.audit_staged_rows(wap_id) == t.scan_staged(
        wap_id, include_base=False
    ).count() == 37
    # damage one staged file on disk: the fresh footer read must raise
    d = t._read_staged(wap_id)
    victim = os.path.join(t.root, d["files"][0]["path"])
    with open(victim, "wb") as f:
        f.write(b"not parquet")
    with pytest.raises(Exception):
        t.audit_staged_rows(wap_id)
    t.discard_staged(wap_id)
