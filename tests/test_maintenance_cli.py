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
