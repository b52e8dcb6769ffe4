"""Row-group-level skipping (lakehouse/table.py plan_row_groups /
scan_rowgroups): on a sort-clustered table a narrow predicate must
skip most ROW GROUPS inside surviving files, and the row-group read
path must return exactly the rows a plain scan returns."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml


def _sorted_table(spark, tmp_path, rows=60_000):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    df = (
        spark.range(rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("g"),
            (F.col("id") * 1.5).alias("v"),
        )
        .sort("k")
        .coalesce(2)  # 2 files, many row groups each
    )
    # tiny row groups so each file holds MANY groups with narrow
    # k-ranges — the shape a clustered 100 TB table has at scale
    t.append(df, writer_options={"parquet.block.size": 64 * 1024})
    return t


def test_rg_plan_skips_most_groups_on_sorted_table(spark, tmp_path):
    t = _sorted_table(spark, tmp_path)
    snap, plans, info = t.plan_row_groups(
        where=[("k", ">=", 10_000), ("k", "<", 11_000)]
    )
    assert info["rowgroups_total"] > 4, "need multi-rowgroup files"
    assert 0 < info["rowgroups_read"] < info["rowgroups_total"] / 2
    # the file-level planner CANNOT prune inside a file: every file
    # whose [min,max] straddles the range survives whole
    assert info["files_planned"] >= 1


def test_rg_scan_matches_plain_scan(spark, tmp_path):
    t = _sorted_table(spark, tmp_path)
    where = [("k", ">=", 10_000), ("k", "<", 11_000)]
    got = sorted(
        (r["k"], r["g"], r["v"]) for r in t.scan_rowgroups(where=where).collect()
    )
    want = sorted(
        (r["k"], r["g"], r["v"]) for r in t.scan(where=where).collect()
    )
    assert got == want and len(got) == 1_000


def test_rg_scan_with_in_keys(spark, tmp_path):
    t = _sorted_table(spark, tmp_path, rows=20_000)
    keys = [5, 7_777, 19_999]
    where = [("k", "in", keys)]
    snap, plans, info = t.plan_row_groups(where=where)
    assert info["rowgroups_read"] < info["rowgroups_total"]
    got = sorted(r["k"] for r in t.scan_rowgroups(where=where).collect())
    assert got == sorted(keys)


def test_rg_scan_unsorted_table_still_exact(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "u"))
    df = spark.range(30_000).select(
        (F.col("id") * 2_654_435_761 % 30_000).alias("k"),  # scrambled
        (F.col("id") % 7).alias("g"),
    )
    t.append(df.coalesce(2), writer_options={"parquet.block.size": 64 * 1024})
    where = [("k", "<", 50)]
    got = sorted(r["k"] for r in t.scan_rowgroups(where=where).collect())
    want = sorted(r["k"] for r in t.scan(where=where).collect())
    assert got == want


def test_rg_scan_falls_back_under_mor_deletes(spark, tmp_path):
    t = _sorted_table(spark, tmp_path, rows=5_000)
    dml.delete_mor(t, "k % 10 = 3")
    where = [("k", "<", 100)]
    got = sorted(r["k"] for r in t.scan_rowgroups(where=where).collect())
    want = sorted(r["k"] for r in t.scan(where=where).collect())
    assert got == want and all(k % 10 != 3 for k in got)


def test_rg_stats_survive_manifest_roundtrip(spark, tmp_path):
    t = _sorted_table(spark, tmp_path, rows=8_000)
    re = LakeTable.load(spark, t.root)
    f = re.snapshot().files[0]
    assert f.rg_stats is not None and len(f.rg_stats) >= 1
    assert all("k" in st for st in f.rg_stats)
    # schema evolution safety: a column appearing in no stats is never
    # pruned on
    _snap, _plans, info = re.plan_row_groups(where=[("missing", ">", 5)])
    assert info["rowgroups_read"] == info["rowgroups_total"]


def test_zorder_rewrite_enables_multicolumn_rg_skipping(spark, tmp_path):
    """After a Z-order rewrite, narrow predicates on EITHER clustered
    column must skip most row groups — the synergy the reference's
    clustering promise implies (sort rewrite exists to make stats
    granularity effective). The rewrite path harvests rg_stats
    automatically (_write_files)."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse.maintenance import (
        rewrite_zorder,
    )

    t = LakeTable.create(spark, str(tmp_path / "z"))
    df = spark.range(40_000).select(
        (F.col("id") * 2_654_435_761 % 40_000).alias("x"),
        (F.col("id") * 40_503 % 40_000).alias("y"),
        F.col("id").alias("payload"),
    )
    t.append(df.coalesce(2), writer_options={"parquet.block.size": 64 * 1024})
    # unclustered: a narrow x-range survives in ~every group
    _s, _p, before = t.plan_row_groups(
        where=[("x", ">=", 1000), ("x", "<", 2000)]
    )
    rewrite_zorder(
        t, ["x", "y"], target_file_size=256 * 1024,
        rowgroup_bytes=32 * 1024,
    )
    snap = t.snapshot()
    assert all(f.rg_stats is not None for f in snap.files)
    for col in ("x", "y"):
        _s, _p, info = t.plan_row_groups(
            where=[(col, ">=", 1000), (col, "<", 2000)]
        )
        assert info["rowgroups_total"] > 4
        assert info["rowgroups_read"] < info["rowgroups_total"] / 2, (
            col,
            info,
        )
        got = t.scan_rowgroups(
            where=[(col, ">=", 1000), (col, "<", 2000)]
        ).count()
        assert got == 1000


def test_sorted_layout_cache_distinguishes_same_basename(spark, tmp_path):
    """r14 (ADVICE): q103's per-process sorted-layout cache was keyed on
    basename(sf_dir) only — two fixture dirs sharing a basename (/a/sf1
    and /b/sf1) silently reused the first one's layout, serving the
    WRONG fixture's data with no error. The key now hashes the full
    normalized path; distinct dirs with equal basenames must build
    distinct layouts with their own data."""
    from de_gcp_lakehouse_iceberg_spark.plans.rowgroup_query import (
        _sorted_layout,
    )

    dir_a = tmp_path / "a" / "sfX"
    dir_b = tmp_path / "b" / "sfX"
    dir_a.mkdir(parents=True)
    dir_b.mkdir(parents=True)
    li_a = spark.range(100).select(
        F.col("id").alias("l_orderkey"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(7).alias("l_suppkey"),
    )
    li_b = spark.range(250).select(
        F.col("id").alias("l_orderkey"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(7).alias("l_suppkey"),
    )
    t_a = _sorted_layout(spark, str(dir_a), li_a)
    t_b = _sorted_layout(spark, str(dir_b), li_b)
    assert t_a.scan().count() == 100
    assert t_b.scan().count() == 250  # not dir_a's cached 100
    # and the cache HIT path still works per distinct dir
    assert _sorted_layout(spark, str(dir_a), li_b).scan().count() == 100
