"""Table cloning (lakehouse/clone.py): logical-content parity
(including pending MOR deletes), carried file-skipping metadata, and
full independence of source and clone after the split."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml
from de_gcp_lakehouse_iceberg_spark.lakehouse.bloom import add_bloom_filters
from de_gcp_lakehouse_iceberg_spark.lakehouse.clone import clone_table


def _rows(t, **kw):
    return sorted(r["k"] for r in t.scan(**kw).collect())


def _src(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"))
    for i in range(3):
        t.append(
            spark.range(i * 20, (i + 1) * 20).select(
                F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
            ),
            operation=f"load_{i}",
        )
    return t


def test_clone_matches_and_is_independent(spark, tmp_path):
    src = _src(spark, tmp_path)
    add_bloom_filters(src, ["k"], bits=65536, k=5)
    dst = clone_table(src, str(tmp_path / "dst"))
    assert _rows(dst) == _rows(src)
    # skipping metadata carried: stats prune AND blooms prune on clone
    _s, planned = dst.plan_files(where=[("k", "=", 25)])
    assert len(planned) == 1
    _s, missing = dst.plan_files(where=[("k", "=", 999)])
    assert missing == []  # stats prune the out-of-range key entirely
    # independence both ways
    dml.delete(dst, "k >= 40")
    assert _rows(dst) == list(range(40)) and len(_rows(src)) == 60
    src.append(spark.range(100, 105).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")))
    assert len(_rows(src)) == 65 and _rows(dst) == list(range(40))
    # fresh history: clone has create + clone commits only
    assert [s.operation for s in dst.snapshots()[:2]] == ["create", "clone"]


def test_clone_materializes_pending_mor_deletes(spark, tmp_path):
    src = _src(spark, tmp_path)
    dml.delete_mor(src, "k % 5 = 0")  # logical delete, files untouched
    assert src.snapshot().deletes  # still pending
    dst = clone_table(src, str(tmp_path / "dst"))
    assert dst.snapshot().deletes == []  # clone starts clean
    assert _rows(dst) == _rows(src)
    s = dst.snapshot().summary
    assert s["materialized_files"] > 0
    # a FUTURE MOR delete on the clone applies to every cloned file
    dml.delete_mor(dst, "k % 2 = 1")
    assert _rows(dst) == [k for k in range(60) if k % 5 and k % 2 == 0]


def test_clone_of_time_travel_and_tag(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.set_tag("audit", 2)
    dml.delete(src, "k < 10")
    by_tag = clone_table(src, str(tmp_path / "by_tag"), tag="audit")
    assert _rows(by_tag) == list(range(40))  # v2 = first two loads
    by_version = clone_table(src, str(tmp_path / "by_v"), version=1)
    assert _rows(by_version) == list(range(20))
    # tags do not transfer
    assert by_tag.tags() == {}


def test_clone_preserves_partition_layout(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), partition_by=["bucket(4, k)"]
    )
    src.append(
        spark.range(40).select(F.col("k" if False else "id").alias("k"))
    )
    dst = clone_table(src, str(tmp_path / "dst"))
    assert dst.partition_by == ["bucket(4, k)"]
    # hidden-partition pruning still works on the clone
    _s, planned = dst.plan_files(where=[("k", "=", 7)])
    assert 0 < len(planned) < len(dst.snapshot().files)
