"""Delta IVM (lakehouse/ivm.py): rollup-after-deltas must equal a
from-scratch recompute under every DML shape, refreshes are
incremental and idempotent, and sums stay exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml
from de_gcp_lakehouse_iceberg_spark.lakehouse.ivm import IncrementalRollup


def _base(spark, tmp_path, rows=300):
    t = LakeTable.create(spark, str(tmp_path / "base"))
    t.append(
        spark.range(rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    return t


def _assert_matches_recompute(rollup, base):
    got = {
        r["g"]: (r["cnt"], float(r["sum_v"]))
        for r in rollup.df().collect()
    }
    want = {
        r["g"]: (r["cnt"], float(r["s"]))
        for r in base.scan()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("v").cast("decimal(28,6)")).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_delta_equals_recompute_under_mixed_dml(spark, tmp_path):
    base = _base(spark, tmp_path)
    rollup = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), base, ["g"], ["v"]
    )
    _assert_matches_recompute(rollup, base)

    dml.delete(base, "k % 11 = 2")
    dml.update(base, {"v": "v * 2.0"}, "k % 5 = 0")
    base.append(
        spark.range(300, 340).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    res = rollup.refresh()
    assert res["mode"] == "delta" and res["delta_rows"] > 0
    _assert_matches_recompute(rollup, base)


def test_refresh_is_idempotent_and_noop_when_fresh(spark, tmp_path):
    base = _base(spark, tmp_path, rows=50)
    rollup = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), base, ["g"], ["v"]
    )
    assert rollup.refresh()["mode"] == "noop"
    dml.delete(base, "k < 10")
    assert rollup.refresh()["mode"] == "delta"
    v = rollup.table.current_version()
    assert rollup.refresh()["mode"] == "noop"
    assert rollup.table.current_version() == v
    _assert_matches_recompute(rollup, base)


def test_group_disappears_when_emptied(spark, tmp_path):
    base = _base(spark, tmp_path, rows=70)
    rollup = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), base, ["g"], ["v"]
    )
    dml.delete(base, "g = 3")
    rollup.refresh()
    assert rollup.df().filter(F.col("g") == 3).count() == 0
    _assert_matches_recompute(rollup, base)


def test_mor_deletes_flow_through_changelog(spark, tmp_path):
    base = _base(spark, tmp_path, rows=100)
    rollup = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), base, ["g"], ["v"]
    )
    dml.delete_mor(base, "k % 3 = 1")  # logical delete, no rewrite
    res = rollup.refresh()
    assert res["mode"] == "delta"
    _assert_matches_recompute(rollup, base)


def test_reload_from_disk(spark, tmp_path):
    base = _base(spark, tmp_path, rows=40)
    IncrementalRollup.create(spark, str(tmp_path / "ru"), base, ["g"], ["v"])
    dml.update(base, {"v": "v + 1.0"}, "g = 2")
    re = IncrementalRollup(spark, str(tmp_path / "ru"))
    assert re.refresh()["mode"] == "delta"
    _assert_matches_recompute(re, base)


def test_null_group_key_stays_one_group(spark, tmp_path):
    """NULL is a real GROUP BY group: deltas must merge into the
    existing NULL-group row (eqNullSafe), not split it in two."""
    base = LakeTable.create(spark, str(tmp_path / "base"))
    base.append(
        spark.range(60).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.col("id") % 4)
            .alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    rollup = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), base, ["g"], ["v"]
    )
    dml.delete(base, "k % 6 = 0")  # touches the NULL group
    base.append(
        spark.range(60, 80).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 3 == 0, None)
            .otherwise(F.col("id") % 4)
            .alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    assert rollup.refresh()["mode"] == "delta"
    out = rollup.df().collect()
    assert sum(1 for r in out if r["g"] is None) == 1  # ONE null group
    _assert_matches_recompute(rollup, base)


def test_refresh_rewrites_only_affected_partitions(spark, tmp_path):
    """The rollup is hidden-partitioned on a group-hash bucket; a
    refresh touching few groups must leave every other partition's
    files BYTE-IDENTICAL (same path, same bytes) — the O(affected
    groups) write claim, not just O(affected groups) math."""
    import hashlib
    import os as _os

    base = _base(spark, tmp_path, rows=400)
    rollup = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), base, ["g"], ["v"], buckets=8
    )

    def _digests():
        out = {}
        for f in rollup.table.snapshot().files:
            p = _os.path.join(rollup.table.root, f.path)
            with open(p, "rb") as fh:
                out[f.path] = hashlib.sha256(fh.read()).hexdigest()
        return out

    before = _digests()
    # touch exactly one group (g = 5): one bucket partition affected
    dml.delete(base, "g = 5 AND k % 2 = 0")
    res = rollup.refresh()
    assert res["mode"] == "delta"
    assert res["files_rewritten"] < res["files_total"]
    after = _digests()
    touched_paths = set(before) - set(after)
    untouched = set(before) & set(after)
    assert untouched, "some partitions must survive the refresh"
    for p in untouched:
        assert before[p] == after[p], f"{p} rewritten byte-differently"
    assert touched_paths or set(after) - set(before)
    _assert_matches_recompute(rollup, base)


def _assert_minmax_matches(rollup, base):
    got = {
        r["g"]: (r["cnt"], float(r["sum_v"]), r["min_v"], r["max_v"])
        for r in rollup.df().collect()
    }
    want = {
        r["g"]: (r["cnt"], float(r["s"]), r["mn"], r["mx"])
        for r in base.scan()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("v").cast("decimal(28,6)")).alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_minmax_delta_equals_recompute_under_mixed_dml(spark, tmp_path):
    """MIN/MAX survive inserts on the delta fast path and deletes via
    targeted per-group recompute — parity with a from-scratch
    re-aggregation pinned under every DML shape, including a delete of
    the row HOLDING an extremum."""
    base = _base(spark, tmp_path, rows=300)
    rollup = IncrementalRollup.create(
        spark,
        str(tmp_path / "ru"),
        base,
        ["g"],
        ["v"],
        minmax_cols=["v"],
    )
    _assert_minmax_matches(rollup, base)

    # insert-only window: pure delta fast path
    base.append(
        spark.range(300, 350).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
    )
    assert rollup.refresh()["mode"] == "delta"
    _assert_minmax_matches(rollup, base)

    # delete the MAX-holding rows of several groups → targeted recompute
    mx = base.scan().agg(F.max("v")).first()[0]
    dml.delete(base, f"v >= {mx - 30.0}")
    assert rollup.refresh()["mode"] == "delta"
    _assert_minmax_matches(rollup, base)

    # delete NOT touching any extremum + update (delete+insert pairs)
    dml.delete(base, "k % 13 = 5 AND v > 10 AND v < 300")
    dml.update(base, {"v": "v * 2.0"}, "k % 17 = 3")
    assert rollup.refresh()["mode"] == "delta"
    _assert_minmax_matches(rollup, base)

    # group created and emptied entirely within one window
    base.append(
        spark.range(1000, 1010).select(
            F.col("id").alias("k"), F.lit(99).alias("g"),
            (F.col("id") * 1.0).alias("v"),
        )
    )
    dml.delete(base, "g = 99")
    assert rollup.refresh()["mode"] == "delta"
    assert rollup.df().filter(F.col("g") == 99).count() == 0
    _assert_minmax_matches(rollup, base)


def test_avg_exposure_decomposes_sum_count(spark, tmp_path):
    base = _base(spark, tmp_path, rows=100)
    rollup = IncrementalRollup.create(
        spark, str(tmp_path / "ru"), base, ["g"], ["v"]
    )
    got = {
        r["g"]: r["avg_v"] for r in rollup.df(with_avg=True).collect()
    }
    want = {
        r["g"]: r["a"]
        for r in base.scan()
        .groupBy("g")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
        .collect()
    }
    assert got == want
