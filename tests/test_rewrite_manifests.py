"""Metadata compaction (maintenance.rewrite_manifests): identical
plan_files output and identical query results pre/post, metadata file
count reduced, commit history preserved through the archive log."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, maintenance


def _build(spark, root, commits=6):
    t = LakeTable.create(spark, str(root))
    for i in range(commits):
        t.append(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("v")
            ),
            operation=f"load_{i}",
        )
    return t


def test_identical_plans_and_results_pre_post(spark, tmp_path):
    t = _build(spark, tmp_path / "t")
    pre_snap, pre_files = t.plan_files(where=[("k", ">=", 25)])
    pre_rows = sorted(r["k"] for r in t.scan(where=[("k", ">=", 25)]).collect())
    mdir = os.path.join(t.root, "_manifests")
    before = len(os.listdir(mdir))

    res = maintenance.rewrite_manifests(t, retention_days=0, keep_last=2)
    assert res["status"] == "success"
    assert res["metadata_files_after"] < before
    assert res["archived_headers"] > 0

    post_snap, post_files = t.plan_files(where=[("k", ">=", 25)])
    assert post_snap.version == pre_snap.version
    assert [f.path for f in post_files] == [f.path for f in pre_files]
    post_rows = sorted(
        r["k"] for r in t.scan(where=[("k", ">=", 25)]).collect()
    )
    assert post_rows == pre_rows
    # a reload sees the same state
    t2 = LakeTable.load(spark, t.root)
    assert t2.scan().count() == 60


def test_history_survives_compaction(spark, tmp_path):
    t = _build(spark, tmp_path / "t", commits=5)
    pre_hist = {
        r["version"]: (r["operation"], r["file_count"], r["total_rows"])
        for r in t.history_df().collect()
    }
    maintenance.rewrite_manifests(t, retention_days=0, keep_last=1)
    post_hist = {
        r["version"]: (r["operation"], r["file_count"], r["total_rows"])
        for r in t.history_df().collect()
    }
    assert post_hist == pre_hist  # every commit still visible
    # but only the retained snapshots still have manifests
    assert len(t.snapshots()) < len(post_hist)


def test_tagged_snapshots_not_compacted(spark, tmp_path):
    t = _build(spark, tmp_path / "t", commits=4)
    t.set_tag("audit", 2)
    maintenance.rewrite_manifests(t, retention_days=0, keep_last=1)
    live = {s.version for s in t.snapshots()}
    assert 2 in live  # tag pins it
    # v0 = create (empty), v1/v2 = first two loads → v2 holds 20 rows
    assert t.scan(tag="audit").count() == 20


def test_rerun_is_idempotent(spark, tmp_path):
    t = _build(spark, tmp_path / "t", commits=4)
    r1 = maintenance.rewrite_manifests(t, retention_days=0, keep_last=1)
    r2 = maintenance.rewrite_manifests(t, retention_days=0, keep_last=1)
    assert r2["archived_headers"] == 0
    assert r2["expired_snapshots"] == 0
    assert r2["metadata_files_after"] <= r1["metadata_files_after"]
    assert len(t.history_df().collect()) == 5  # create + 4 loads
