"""Maintenance CLI: action dispatch against a real warehouse (mirrors
the reference's tests/test_iceberg_maintenance.py orchestration checks,
but end-to-end instead of SQL-text mocks)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark import maintenance_cli
from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, Warehouse


@pytest.fixture()
def warehouse(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    t = wh.create_table("taxi_trips")
    for i in range(4):
        t.append(
            spark.range(25).select(
                (F.col("id") + i * 25).alias("trip_id"),
                (F.col("id") % 3).alias("zone"),
                (F.col("id") * 1.1).alias("amount"),
            )
        )
    return root


def _run(args: list[str]) -> dict:
    ns = maintenance_cli.build_parser().parse_args(args)
    return maintenance_cli.run_action(ns)


def test_compact_action(warehouse):
    res = _run(["--warehouse", warehouse, "--action", "compact"])
    assert res["status"] == "success"
    assert res["files_after"] < res["files_before"]


def test_stats_action(warehouse):
    res = _run(["--warehouse", warehouse, "--action", "stats"])
    assert res["row_count"] == 100
    assert res["columns"]["zone"]["max"] == 2


def test_cleanup_dry_run(warehouse):
    res = _run(
        ["--warehouse", warehouse, "--action", "cleanup",
         "--orphan-age-days", "0", "--dry-run"]
    )
    assert res["dry_run"] is True and res["orphans"] == []


def test_full_action_report(warehouse):
    res = _run(
        ["--warehouse", warehouse, "--action", "full",
         "--sort-columns", "zone,trip_id", "--retention-days", "0"]
    )
    assert [a["action"] for a in res["actions"]] == [
        "statistics",
        "compaction",
        "sort_rewrite",
        "expire_snapshots",
        "orphan_cleanup",
        "partition_health",
    ]
    assert json.dumps(res)  # report is JSON-serializable


def test_mv_refresh_action(spark, warehouse):
    wh = Warehouse(spark, warehouse)
    wh.create_materialized_view(
        "zone_counts",
        "SELECT zone, count(*) AS c FROM taxi_trips GROUP BY zone",
        refresh_minutes=0.0,
    )
    wh.table("taxi_trips").append(
        spark.range(10).select(
            (F.col("id") + 1000).alias("trip_id"),
            F.lit(9).alias("zone"),
            F.lit(1.0).alias("amount"),
        )
    )
    res = _run(["--warehouse", warehouse, "--action", "mv-refresh"])
    assert res["refreshed"] == ["zone_counts"]
    got = {r.zone: r.c for r in wh.table("zone_counts").scan().collect()}
    assert got[9] == 10


def test_refs_rollback_wap_bloom_cdc_actions(spark, warehouse):
    base = ["--warehouse", warehouse, "--table", "taxi_trips"]

    out = _run(base + ["--action", "tag", "--tag-name", "stable"])
    assert out["name"] == "stable" and out["version"] >= 1

    t = LakeTable.load(spark, warehouse + "/taxi_trips")
    v_before = t.current_version()
    t.append(
        spark.range(5).select(
            (F.col("id") + 1000).alias("trip_id"),
            F.lit(0).alias("zone"),
            F.lit(9.9).alias("amount"),
        )
    )
    out = _run(base + ["--action", "rollback", "--version", str(v_before)])
    assert out["rolled_back_to"] == v_before
    assert t.scan().count() == 100

    wap = t.stage_append(
        spark.range(3).select(
            (F.col("id") + 2000).alias("trip_id"),
            F.lit(1).alias("zone"),
            F.lit(1.0).alias("amount"),
        )
    )
    refs = _run(base + ["--action", "refs"])
    assert refs["tags"] == {"stable": out["rolled_back_to"]}
    assert wap in refs["staged"]
    out = _run(base + ["--action", "wap-publish", "--wap-id", wap])
    assert out["summary"]["wap_id"] == wap
    assert t.scan().count() == 103

    out = _run(base + ["--action", "bloom", "--bloom-columns", "trip_id"])
    assert out["columns"] == ["trip_id"]
    _snap, kept = t.plan_files(where=[("trip_id", "=", 2001)])
    assert t.scan(where=[("trip_id", "=", 2001)]).count() == 1

    out = _run(base + ["--action", "cdc-export"])
    assert out["exported_versions"] == t.current_version()

    hist = _run(base + ["--action", "history"])
    ops = [h["operation"] for h in hist["history"]]
    assert "rollback" in ops and "publish" in ops


def test_mor_cli_actions(spark, warehouse):
    base = ["--warehouse", warehouse, "--table", "taxi_trips"]
    out = _run(base + ["--action", "delete-mor",
                       "--predicate", "zone = 1"])
    assert out["predicate"] == "zone = 1"
    t = LakeTable.load(spark, warehouse + "/taxi_trips")
    assert t.scan().filter("zone = 1").count() == 0
    n_after_delete = t.scan().count()
    out = _run(base + ["--action", "materialize-deletes"])
    assert out["remaining_deletes"] == 0
    assert t.scan().count() == n_after_delete


def test_ivm_cli_actions(spark, warehouse, tmp_path):
    from de_gcp_lakehouse_iceberg_spark.lakehouse import dml

    root = str(tmp_path / "rollup")
    args = maintenance_cli.build_parser().parse_args(
        ["--warehouse", warehouse, "--action", "ivm-create",
         "--table", "taxi_trips", "--rollup-root", root,
         "--group-cols", "zone", "--sum-cols", "amount"]
    )
    res = maintenance_cli.run_action(args)
    assert res["action"] == "ivm-create" and res["rows"] == 3

    t = LakeTable.load(spark, f"{warehouse}/taxi_trips")
    dml.delete(t, "trip_id % 4 = 1")
    args = maintenance_cli.build_parser().parse_args(
        ["--warehouse", warehouse, "--action", "ivm-refresh",
         "--table", "taxi_trips", "--rollup-root", root]
    )
    res = maintenance_cli.run_action(args)
    assert res["action"] == "ivm-refresh" and res["mode"] == "delta"
    # second refresh is a noop
    assert maintenance_cli.run_action(args)["mode"] == "noop"


def test_rewrite_manifests_action(spark, warehouse):
    args = maintenance_cli.build_parser().parse_args(
        ["--warehouse", warehouse, "--action", "rewrite-manifests",
         "--table", "taxi_trips", "--retention-days", "0"]
    )
    res = maintenance_cli.run_action(args)
    assert res["status"] == "success"
    assert res["metadata_files_after"] <= res["metadata_files_before"]


def test_clone_action(spark, warehouse, tmp_path):
    dest = str(tmp_path / "cloned")
    args = maintenance_cli.build_parser().parse_args(
        ["--warehouse", warehouse, "--action", "clone",
         "--table", "taxi_trips", "--clone-to", dest]
    )
    res = maintenance_cli.run_action(args)
    assert res["action"] == "clone"
    src = LakeTable.load(spark, f"{warehouse}/taxi_trips")
    dst = LakeTable.load(spark, dest)
    assert dst.scan().count() == src.scan().count()


def test_cli_ivm_join_rollup_lifecycle(spark, tmp_path):
    """ivm-join-create then the generic ivm-refresh (load_rollup
    dispatches on the persisted config) — a dim update must move the
    joined contributions and parity must hold with a re-join."""
    import os

    from pyspark.sql import functions as F

    from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml
    from de_gcp_lakehouse_iceberg_spark.maintenance_cli import (
        build_parser,
        run_action,
    )

    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    fact = LakeTable.create(spark, os.path.join(wh, "fact"))
    fact.append(
        spark.range(120).select(
            F.col("id").alias("fk"),
            (F.col("id") % 7).alias("k"),
            (F.col("id") * 2.0).alias("v"),
        )
    )
    dim = LakeTable.create(spark, os.path.join(wh, "dim"))
    dim.append(
        spark.range(7).select(
            F.col("id").alias("k"),
            F.concat(F.lit("g"), F.col("id") % 3).alias("seg"),
        )
    )
    ru_root = str(tmp_path / "ru")
    res = run_action(build_parser().parse_args([
        "--warehouse", wh, "--action", "ivm-join-create",
        "--table", "fact", "--dim-table", "dim",
        "--join-keys", "k", "--rollup-root", ru_root,
        "--group-cols", "seg", "--sum-cols", "v",
    ]))
    assert res["rows"] == 3
    dml.update(dim, {"seg": "'moved'"}, "k = 2")
    dml.delete(fact, "fk % 5 = 0")
    res = run_action(build_parser().parse_args([
        "--warehouse", wh, "--action", "ivm-refresh",
        "--table", "fact", "--rollup-root", ru_root,
    ]))
    assert res["mode"] == "delta"

    from de_gcp_lakehouse_iceberg_spark.lakehouse.ivm import load_rollup

    ru = load_rollup(spark, ru_root)
    f, d = fact.scan(), dim.scan()
    want = {
        r["seg"]: (r["cnt"], float(r["s"]))
        for r in f.join(d, f["k"] == d["k"]).groupBy("seg").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("v").cast("decimal(28,6)")).alias("s"),
        ).collect()
    }
    got = {
        r["seg"]: (r["cnt"], float(r["sum_v"]))
        for r in ru.df().collect()
    }
    assert got == want and "moved" in got
