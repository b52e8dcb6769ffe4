"""Streaming CDC feed (streaming/cdc_stream.py): incremental export +
readStream delivery equals the batch changelog."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import changelog, update
from de_gcp_lakehouse_iceberg_spark.streaming.cdc_stream import (
    export_changelog,
    exported_version,
    read_changelog_stream,
)


def _drain(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", f"/tmp/cdc_stream_ckpt_{name}_{time.time_ns()}"
        )
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_cdc_stream_matches_batch_changelog(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.range(0, 6).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    update(t, {"v": F.lit(999).cast("long")}, F.col("k") == 2)

    assert export_changelog(t) == t.current_version()
    assert export_changelog(t) == 0                 # idempotent
    assert exported_version(t) == t.current_version()

    got = _drain(spark, read_changelog_stream(spark, t), "cdc1")
    want = changelog(t, 0, t.current_version()).select(*got.columns)
    key = lambda r: (r.k, r._change_type, r._change_version)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(
        map(key, want.collect())
    )
    # UPDATE shows as DELETE(old) + INSERT(new) at the changed key
    kinds = {
        (r.k, r.v): r._change_type
        for r in got.collect()
        if r._change_version == 2
    }
    assert kinds[(2, 20)] == "DELETE" and kinds[(2, 999)] == "INSERT"


def test_cdc_stream_incremental_and_resumable(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 3).select(F.col("id").alias("k")))
    export_changelog(t)

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            read_changelog_stream(spark, t)
            .writeStream.format("parquet")
            .option("path", out)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)     # SAME checkpoint
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    first = drain()
    assert {r.k for r in first} == {0, 1, 2}

    t.append(spark.range(10, 12).select(F.col("id").alias("k")))
    assert export_changelog(t) == 1
    # resumed consumer (same checkpoint) appends ONLY the new commit
    second = drain()
    assert {r.k for r in second} == {0, 1, 2, 10, 11}
    new_rows = [r for r in second if r._change_version == 2]
    assert {r.k for r in new_rows} == {10, 11}
    assert len(second) == 5                          # no re-delivery


def test_cdc_stream_bootstraps_v0_rows(spark, tmp_path):
    """A table whose FOUNDING snapshot (v0) already carries data must
    feed those rows as INSERTs on first export — changelog() diffs
    v-1→v so it cannot express v0, and a consumer reading the stream
    alone would otherwise silently miss the founding rows."""
    import json as _json
    import os

    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(spark.range(0, 4).select(F.col("id").alias("k")))
    # graft the v1 manifest onto v0 to simulate a table born with data
    # (e.g. a manifest imported from an existing parquet directory)
    mdir = os.path.join(t.root, "_manifests")
    with open(os.path.join(mdir, "v00000001.json")) as f:
        m = _json.load(f)
    m["version"] = 0
    m["operation"] = "create"
    with open(os.path.join(mdir, "v00000000.json"), "w") as f:
        _json.dump(m, f)
    os.remove(os.path.join(mdir, "v00000001.json"))
    with open(os.path.join(t.root, "_current"), "w") as f:
        f.write("0")

    assert t.current_version() == 0
    assert export_changelog(t) == 1          # v0 bootstrap counts
    assert export_changelog(t) == 0          # idempotent
    got = _drain(spark, read_changelog_stream(spark, t), "cdc_v0")
    rows = got.collect()
    assert sorted(r.k for r in rows) == [0, 1, 2, 3]
    assert all(
        r._change_type == "INSERT" and r._change_version == 0 for r in rows
    )


def test_cdc_stream_sees_mor_delete_once(spark, tmp_path):
    """A streaming CDC consumer must observe a merge-on-read delete as
    DELETE rows at the delete_mor commit — and observe NOTHING extra
    when the delete is later materialized (exactly-once visibility
    before AND after compaction)."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import (
        delete_mor,
        materialize_deletes,
    )

    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.range(0, 6).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).alias("par"),
        )
    )
    export_changelog(t)

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            read_changelog_stream(spark, t)
            .writeStream.format("parquet")
            .option("path", out)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    assert {r.k for r in drain()} == {0, 1, 2, 3, 4, 5}

    delete_mor(t, "par = 1")                 # v2: logical delete
    assert export_changelog(t) == 1
    after_delete = drain()
    dels = [r for r in after_delete if r._change_type == "DELETE"]
    assert sorted(r.k for r in dels) == [1, 3, 5]
    assert all(r._change_version == 2 for r in dels)

    materialize_deletes(t)                   # v3: physical rewrite
    export_changelog(t)
    after_mat = drain()
    # exactly once: materialization emits no additional change rows
    assert len(after_mat) == len(after_delete)
