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
