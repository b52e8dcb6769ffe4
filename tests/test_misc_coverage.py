"""Odds and ends: scheduler loop cadence, approx-median accuracy bound,
merge with partial-column sources."""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark import maintenance_cli
from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, Warehouse, dml
from de_gcp_lakehouse_iceberg_spark.plans import QUERIES
from de_gcp_lakehouse_iceberg_spark.tables import table


def test_schedule_loop_runs_bounded(spark, tmp_path, capsys):
    """M10: one scheduler tick runs the hourly compaction and the MV
    staleness sweep without blocking."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    t = wh.create_table("taxi_trips")
    for _ in range(3):
        t.append(spark.range(20).select(F.col("id").alias("trip_id")))
    args = maintenance_cli.build_parser().parse_args(
        ["--warehouse", root, "--action", "schedule", "--schedule-interval-s", "0"]
    )
    maintenance_cli.run_schedule(args, iterations=1)
    out = capsys.readouterr().out
    assert '"files_before"' in out  # compaction ran and reported
    assert '"mv-refresh"' in out


def test_approx_median_within_tolerance(spark, sf_dir_medium):
    """q23 reduces the engine-specific approx sketch to a tolerance flag
    against the exact PERCENTILE_CONT (the hashed, oracle-compared
    shape); every group's flag must hold and the exact median must match
    an independent recomputation."""
    rows = {
        r.event_type: r
        for r in QUERIES["q23_approx_median"](spark, sf_dir_medium).collect()
    }
    assert all(r.approx_within_5pct for r in rows.values())
    ev = table(spark, sf_dir_medium, "events")
    ev.createOrReplaceTempView("_tol_events")
    exact = {
        r.event_type: r.m
        for r in spark.sql(
            """SELECT event_type,
                      percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS m
               FROM _tol_events GROUP BY event_type"""
        ).collect()
    }
    assert set(rows) == set(exact)
    for k in exact:
        assert abs(rows[k].exact_median - exact[k]) < 1e-6, (k, rows[k], exact[k])


def test_merge_source_missing_target_columns(spark, tmp_path):
    """Inserted rows from a narrower source fill NULL for target columns
    the source doesn't carry (the reference's partial-staging MERGE)."""
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 10.0, "x")], "key long, amount double, note string"
        )
    )
    src = spark.createDataFrame([(1, 99.0), (2, 5.0)], "key long, amount double")
    dml.merge(
        t, src, on=["key"],
        when_matched_update={"amount": F.col("source.amount")},
        when_not_matched_insert=True,
    )
    rows = {r.key: (r.amount, r.note) for r in t.scan().collect()}
    assert rows[1] == (99.0, "x")   # matched: updated, note preserved
    assert rows[2] == (5.0, None)   # inserted: missing column → NULL
