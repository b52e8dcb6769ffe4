"""Vacuum coverage for the newer artifact families (B16, 3-day age
bound analog — iceberg_maintenance.py:134-142): discarded WAP stages
from failed index audits, stages abandoned by crashed writers, and
files copied by an interrupted clone must all become orphans that
`cleanup_orphans` sweeps — with live queries unaffected throughout."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.clone import clone_table
from de_gcp_lakehouse_iceberg_spark.lakehouse.dedup_index import (
    SignatureIndex,
)
from de_gcp_lakehouse_iceberg_spark.lakehouse.maintenance import (
    cleanup_orphans,
)

_FUTURE = time.time() * 1000 + 3600_000  # everything is "old enough"


def _docs(spark, n=40, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("common prefix text number "), F.col("id")).alias(
            "text"
        ),
    )


def _data_parquets(root):
    out = []
    for dirpath, _d, fns in os.walk(os.path.join(root, "data")):
        out += [os.path.join(dirpath, f) for f in fns if f.endswith(".parquet")]
    return sorted(out)


def test_failed_index_audit_files_are_vacuumed(spark, tmp_path):
    idx = SignatureIndex.create(spark, str(tmp_path / "idx"))
    idx.append(_docs(spark))
    before_files = set(_data_parquets(idx.table.root))
    before_rows = idx.df().count()

    # break the audit: the staged-side count "loses" rows, so append
    # must discard the stage (dedup_index.py audit branch) and raise.
    # r15: the audit reads the staged files' parquet footers
    # (audit_staged_rows) instead of re-scanning the rows.
    orig = idx.table.audit_staged_rows

    def lossy(wap_id):
        return orig(wap_id) - 3

    idx.table.audit_staged_rows = lossy
    with pytest.raises(RuntimeError, match="audit failed"):
        idx.append(_docs(spark, start=1000))
    idx.table.audit_staged_rows = orig

    # the discarded stage's files linger on disk, unreferenced
    assert idx.table.staged_ids() == []
    leftover = set(_data_parquets(idx.table.root)) - before_files
    assert leftover, "failed audit should leave orphaned stage files"

    res = cleanup_orphans(idx.table, older_than_days=-0.1)
    assert res["orphans"], "vacuum must collect the discarded stage"
    assert set(_data_parquets(idx.table.root)) == before_files
    assert idx.df().count() == before_rows  # live index untouched


def test_abandoned_stage_expires_then_sweeps(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(spark.range(10).select(F.col("id").alias("k")))
    wap = t.stage_append(spark.range(10, 30).select(F.col("id").alias("k")))
    # a LIVE stage is protected even past the age bound unless expired
    assert t.remove_orphans(older_than_ms=_FUTURE, dry_run=True) == []
    res = cleanup_orphans(t, older_than_days=-0.1)
    assert wap in res["expired_stages"]
    assert res["orphans"], "expired stage's files swept in the same pass"
    assert t.staged_ids() == []
    assert t.scan().count() == 10  # committed data unaffected


def test_fresh_stage_survives_aged_vacuum(spark, tmp_path):
    """The age bound protects IN-FLIGHT ingests: a stage younger than
    the cutoff is neither expired nor swept."""
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(spark.range(5).select(F.col("id").alias("k")))
    wap = t.stage_append(spark.range(5, 9).select(F.col("id").alias("k")))
    res = cleanup_orphans(t, older_than_days=3.0)  # stage is seconds old
    assert res["expired_stages"] == [] and res["orphans"] == []
    snap = t.publish(wap)
    assert snap is not None and t.scan().count() == 9


def test_interrupted_clone_target_is_vacuumable(spark, tmp_path, monkeypatch):
    src = LakeTable.create(spark, str(tmp_path / "src"))
    for i in range(3):  # several files so the copy can die mid-flight
        src.append(
            spark.range(i * 20, (i + 1) * 20).select(F.col("id").alias("k"))
        )
    src_rows = src.scan().count()

    import de_gcp_lakehouse_iceberg_spark.lakehouse.clone as clone_mod

    calls = {"n": 0}
    real_copy = clone_mod.shutil.copy2

    def dying_copy(a, b):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated I/O failure mid-clone")
        return real_copy(a, b)

    monkeypatch.setattr(clone_mod.shutil, "copy2", dying_copy)
    dst_root = str(tmp_path / "dst")
    with pytest.raises(OSError, match="mid-clone"):
        clone_table(src, dst_root)
    monkeypatch.undo()

    # the aborted target is a valid (empty) table holding stray copies
    dst = LakeTable.load(spark, dst_root)
    assert dst.snapshot().files == []
    assert _data_parquets(dst_root), "aborted clone left files behind"
    res = cleanup_orphans(dst, older_than_days=-0.1)
    assert res["orphans"]
    assert _data_parquets(dst_root) == []
    # source completely unaffected; a retried clone then succeeds
    assert src.scan().count() == src_rows
    dst2 = clone_table(src, str(tmp_path / "dst2"))
    assert dst2.scan().count() == src_rows
