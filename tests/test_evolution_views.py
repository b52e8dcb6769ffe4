"""Schema evolution (D6: metadata-only ADD/DROP COLUMN, old-rows-NULL,
defaults, audit log — PRD.md:3421-3473 semantics) and the warehouse
view layer (D7 logical views, D8 materialized views with staleness)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import (
    LakeTable,
    Warehouse,
    evolution,
)


def _df(spark, n=20, with_tip=False):
    df = spark.range(n).select(
        F.col("id").alias("trip_id"),
        (F.col("id") * 2.0).alias("amount"),
    )
    if with_tip:
        df = df.withColumn("tip", F.lit(1.5))
    return df


def test_add_column_old_rows_null_new_rows_valued(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(_df(spark, 10))
    evolution.add_column(t, "tip", "double")
    t.append(_df(spark, 5, with_tip=True).withColumn("trip_id", F.col("trip_id") + 100))
    out = t.scan()
    assert "tip" in out.columns
    old = out.filter("trip_id < 100")
    new = out.filter("trip_id >= 100")
    assert old.filter("tip IS NULL").count() == 10  # PRD.md:3421-3473
    assert new.filter("tip = 1.5").count() == 5
    # data files untouched: metadata-only commit
    assert t.snapshot().operation == "append"
    assert any(s.operation == "add_column" for s in t.snapshots())


def test_add_column_default_applied_on_read(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(_df(spark, 4))
    evolution.add_column(t, "status", "string", default="unknown")
    got = evolution.apply_defaults(t, t.scan())
    assert got.filter("status = 'unknown'").count() == 4


def test_drop_column_and_audit_log(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(_df(spark, 4))
    evolution.add_column(t, "tip", "double")
    evolution.drop_column(t, "amount")
    assert set(t.scan().columns) == {"trip_id", "tip"}
    log = evolution.evolution_log_df(t).orderBy("applied_at_ms").collect()
    assert [(r.change_type, r.column_name) for r in log] == [
        ("ADD_COLUMN", "tip"),
        ("DROP_COLUMN", "amount"),
    ]
    assert log[1].old_type == "double"


def test_warehouse_views_compose(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.create_table("trips")
    t.append(_df(spark, 10))
    # P10-style narrow projection view + aggregate view over it
    wh.create_view("trips_v1", "SELECT trip_id, amount FROM trips WHERE trip_id < 8")
    wh.create_view("trips_sum", "SELECT count(*) AS c, sum(amount) AS s FROM trips_v1")
    assert wh.query_view("trips_v1").count() == 8
    row = wh.query_view("trips_sum").collect()[0]
    assert row.c == 8 and row.s == sum(i * 2.0 for i in range(8))
    assert wh.sql("SELECT count(*) AS n FROM trips").collect()[0].n == 10


def test_materialized_view_refresh_and_staleness(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.create_table("trips")
    t.append(_df(spark, 6))
    wh.create_materialized_view(
        "daily_stats", "SELECT count(*) AS c FROM trips", refresh_minutes=0.0001
    )
    assert wh.table("daily_stats").scan().collect()[0].c == 6
    # base table grows; MV is stale until refreshed (D8 semantics)
    t.append(_df(spark, 4).withColumn("trip_id", F.col("trip_id") + 50))
    assert wh.table("daily_stats").scan().collect()[0].c == 6
    time.sleep(0.05)
    assert "daily_stats" in wh.stale_materialized_views()
    wh.refresh_materialized_view("daily_stats")
    assert wh.table("daily_stats").scan().collect()[0].c == 10
    # refresh is an overwrite snapshot → history retained
    ops = [s.operation for s in wh.table("daily_stats").snapshots()]
    assert ops.count("overwrite") >= 2


def test_apply_defaults_scoped_to_pre_evolution_files(spark, tmp_path):
    """ADD COLUMN DEFAULT backfills only rows that existed at evolution
    time; rows appended LATER with an explicit NULL stay NULL
    (BigQuery/Iceberg semantics)."""
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(_df(spark, 4))  # pre-evolution rows: defaults apply
    evolution.add_column(t, "status", "string", default="unknown")
    post = _df(spark, 3).withColumn("trip_id", F.col("trip_id") + 100)
    t.append(post.withColumn("status", F.lit(None).cast("string")))
    got = evolution.apply_defaults(t, t.scan())
    assert got.filter("trip_id < 100 AND status = 'unknown'").count() == 4
    assert got.filter("trip_id >= 100 AND status IS NULL").count() == 3


def test_widen_column_migration_flow(spark, tmp_path):
    """PRD 'Evolution 7': add precise column + backfill + compat view +
    MODIFY_COLUMN log entry; old and new columns agree exactly."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.create_table("trips")
    t.append(_df(spark, 12))  # trip_id, amount double
    evolution.widen_column(t, "amount", "decimal(38,18)", warehouse=wh)

    base = t.scan()
    assert "amount_precise" in base.columns
    assert base.filter("amount_precise IS NULL").count() == 0
    assert (
        base.filter(
            "amount_precise <> CAST(amount AS DECIMAL(38,18))"
        ).count()
        == 0
    )
    # compat view renames precise -> original name, drops the old column
    v = wh.query_view("trips_precise")
    assert set(v.columns) == {"trip_id", "amount"}
    assert dict(v.dtypes)["amount"] == "decimal(38,18)"
    assert v.count() == 12
    log = evolution.evolution_log_df(t).collect()
    kinds = {(r.change_type, r.column_name) for r in log}
    assert ("ADD_COLUMN", "amount_precise") in kinds
    assert ("MODIFY_COLUMN", "amount") in kinds


def _mv_warehouse(spark, tmp_path):
    from de_gcp_lakehouse_iceberg_spark.lakehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = wh.create_table("sales", partition_by=["day"])
    rows = [(d, i, float(i)) for d in ("d1", "d2", "d3") for i in range(10)]
    base.append(
        spark.createDataFrame(rows, "day string, sale_id long, amount double")
    )
    wh.create_materialized_view(
        "daily_totals",
        "SELECT day, count(*) AS cnt, sum(CAST(amount AS DECIMAL(18,2))) AS total"
        " FROM sales GROUP BY day",
        base_table="sales",
        partition_col="day",
    )
    return wh, base


def test_incremental_mv_refresh_touches_only_changed_partition(spark, tmp_path):
    """A 1-partition source append must rewrite exactly 1 MV partition,
    with results equal to a full recompute."""
    wh, base = _mv_warehouse(spark, tmp_path)
    mv = wh.table("daily_totals")
    files_before = {f.path: f for f in mv.snapshot().files}

    # append to ONE day only
    base.append(
        spark.createDataFrame(
            [("d2", 100, 5.0), ("d2", 101, 7.0)],
            "day string, sale_id long, amount double",
        )
    )
    wh.refresh_materialized_view("daily_totals")
    mv = wh.table("daily_totals")
    snap = mv.snapshot()
    assert snap.operation == "mv_incremental_refresh"
    assert snap.summary["refreshed_partitions"] == ["d2"]
    files_after = {f.path: f for f in snap.files}
    # d1/d3 files untouched byte-for-byte (same manifest entries)
    untouched = {
        p for p, f in files_before.items() if f.partition.get("day") != "d2"
    }
    assert untouched <= set(files_after)
    # result equals the full recompute of the view definition
    got = {
        (r.day, r.cnt, float(r.total))
        for r in mv.scan().select("day", "cnt", "total").collect()
    }
    want = {
        (r.day, r.cnt, float(r.total))
        for r in wh.query_view("_mv_def_daily_totals").collect()
    }
    assert got == want
    assert {r[0] for r in got} == {"d1", "d2", "d3"}


def test_incremental_mv_refresh_noop_touches_freshness_only(spark, tmp_path):
    wh, base = _mv_warehouse(spark, tmp_path)
    mv = wh.table("daily_totals")
    rows_before = {tuple(r) for r in mv.scan().collect()}
    wh.refresh_materialized_view("daily_totals")
    mv = wh.table("daily_totals")
    assert mv.snapshot().operation == "mv_refresh_noop"
    assert {tuple(r) for r in mv.scan().collect()} == rows_before
