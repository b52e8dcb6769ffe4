"""Lakehouse table layer: ACID append, time travel, COW DML, changelog,
compaction, snapshot expiry, orphan cleanup — mirrors the reference's
maintenance/DML test tier (tests/test_iceberg_maintenance.py) but against
a real local warehouse instead of mocks."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse import dml, maintenance


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _orders_df(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 7).alias("bucket"),
        (F.col("id") * 1.5 + 10).alias("amount"),
        F.date_add(F.lit("2025-01-01").cast("date"), (F.col("id") % 5).cast("int"))
        .cast("string")
        .alias("order_date"),
    )


def test_create_append_scan(spark, warehouse):
    t = LakeTable.create(spark, warehouse, partition_by=["order_date"])
    df = _orders_df(spark)
    t.append(df)
    assert t.scan().count() == 100
    t.append(df.filter(F.col("order_id") < 10))
    assert t.scan().count() == 110
    # partition dirs materialized + partition column readable
    assert t.scan().select("order_date").distinct().count() == 5


def test_append_schema_alignment(spark, warehouse):
    """Appends cast to the table schema (no type drift across files);
    unknown columns are rejected until the schema is evolved."""
    import pytest as _pytest
    from pyspark.sql.functions import lit

    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark, 10))
    # int-typed bucket and missing column are aligned, not drifted
    t.append(
        spark.range(5).select(
            (F.col("id") + 100).alias("order_id"),
            F.lit(1).cast("int").alias("bucket"),
            (F.col("id") * 1.0).alias("amount"),
        )
    )
    assert dict(t.scan().dtypes)["bucket"] == "bigint"
    assert t.scan().filter("order_date IS NULL").count() == 5
    assert t.scan().count() == 15
    with _pytest.raises(ValueError, match="not in table schema"):
        t.append(_orders_df(spark, 3).withColumn("surprise", lit(1)))


def test_time_travel_versions(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark, 50))
    v1 = t.current_version()
    ts_after_v1 = int(time.time() * 1000)
    time.sleep(0.01)
    t.append(_orders_df(spark, 30))
    assert t.scan().count() == 80
    assert t.scan(version=v1).count() == 50
    assert t.scan(as_of_ms=ts_after_v1).count() == 50  # S5 FOR SYSTEM_TIME AS OF


def test_partition_pruned_scan(spark, warehouse):
    t = LakeTable.create(spark, warehouse, partition_by=["order_date"])
    t.append(_orders_df(spark))
    pruned = t.scan(partition_filter=lambda p: p.get("order_date") == "2025-01-01")
    assert pruned.count() == 20
    # only 1 of 5 partitions' files are handed to Spark
    assert len(pruned.inputFiles()) < len(t.scan().inputFiles())


def test_delete(spark, warehouse):
    t = LakeTable.create(spark, warehouse, partition_by=["order_date"])
    t.append(_orders_df(spark))
    dml.delete(t, "bucket = 3")
    assert t.scan().filter("bucket = 3").count() == 0
    assert t.scan().count() == 100 - 14  # ids 3,10,17,...,94 → 14 of 100
    # previous snapshot untouched (time travel across DML)
    assert t.scan(version=t.current_version() - 1).count() == 100


def test_update(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark))
    dml.update(t, {"amount": F.lit(0.0)}, "bucket = 1")
    got = t.scan().filter("bucket = 1").select(F.sum("amount")).collect()[0][0]
    assert got == 0.0
    untouched = t.scan().filter("bucket != 1").filter("amount = 0").count()
    assert untouched == 0


def test_merge_update_and_insert(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark, 20))
    source = spark.createDataFrame(
        [(5, 999.0), (19, 888.0), (100, 123.0)], "order_id long, new_amount double"
    ).select(
        "order_id",
        (F.col("order_id") % 7).alias("bucket"),
        F.col("new_amount").alias("amount"),
        F.lit("2025-02-01").alias("order_date"),
    )
    dml.merge(
        t,
        source,
        on=["order_id"],
        when_matched_update={"amount": F.col("source.amount")},
        when_not_matched_insert=True,
    )
    out = {r.order_id: r.amount for r in t.scan().collect()}
    assert out[5] == 999.0 and out[19] == 888.0  # matched → updated
    assert out[100] == 123.0  # not matched → inserted
    assert len(out) == 21
    assert out[6] == 6 * 1.5 + 10  # untouched row preserved


def test_changelog(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark, 10))
    v_base = t.current_version()
    t.append(_orders_df(spark, 5).withColumn("order_id", F.col("order_id") + 1000))
    dml.delete(t, "order_id = 2")
    ch = dml.changelog(t, v_base, t.current_version())
    by_type = {r["_change_type"]: r["cnt"] for r in
               ch.groupBy("_change_type").agg(F.count("*").alias("cnt")).collect()}
    assert by_type["INSERT"] == 5
    assert by_type["DELETE"] == 1


def test_concurrent_modification_rejected(spark, warehouse):
    """Optimistic concurrency validation: a stale-base commit REBASES
    over commits that left its replaced files untouched (appends
    commute), and fails loudly when a concurrent commit rewrote one of
    them — never a silent lost update."""
    import pytest as _pytest

    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark, 20))
    stale = t.snapshot()
    t.append(_orders_df(spark, 5))  # another writer lands an append
    # the stale-planned delete rebases: its file is untouched at head
    t.replace_files(
        [stale.files[0].path],
        None,
        operation="delete",
        expected_base=stale.version,
    )
    # append survived, the one stale file's rows are gone
    assert t.scan().count() == 25 - stale.files[0].rows
    # but replacing a file a concurrent commit ALREADY removed conflicts
    with _pytest.raises(RuntimeError, match="rewritten or removed"):
        t.replace_files(
            [stale.files[0].path],
            None,
            operation="delete",
            expected_base=stale.version,
        )


def test_ctas_from_time_travel(spark, warehouse, tmp_path):
    """D9: CREATE TABLE AS SELECT ... FOR SYSTEM_TIME AS OF — a new
    table materialized from a historical snapshot (PRD.md:975-988)."""
    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark, 40))
    v1 = t.current_version()
    t.append(_orders_df(spark, 25))
    snap_table = LakeTable.create(spark, str(tmp_path / "monthly_snapshot"))
    snap_table.append(t.scan(version=v1))
    assert snap_table.scan().count() == 40
    assert t.scan().count() == 65  # source unaffected


def test_compaction_reduces_files_preserves_rows(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    for i in range(6):  # many small appends → many small files
        t.append(_orders_df(spark, 10).withColumn("order_id", F.col("order_id") + i * 10))
    before = len(t.snapshot().files)
    res = maintenance.compact(t)
    assert res["status"] == "success"
    assert len(t.snapshot().files) < before
    assert t.scan().count() == 60  # B12 semantics: counts unchanged


def test_sort_rewrite(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark, 200))
    res = maintenance.rewrite_sorted(t, ["bucket", "order_id"])
    assert res["status"] == "success"
    assert t.scan().count() == 200


def test_expire_snapshots_and_orphans(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    t.append(_orders_df(spark, 10))
    t.overwrite(_orders_df(spark, 5))
    assert len(t.snapshots()) == 3
    res = t.expire_snapshots(older_than_ms=int(time.time() * 1000) + 1000, keep_last=1)
    assert res["expired_snapshots"] == 2
    assert res["deleted_files"] > 0  # overwritten files physically removed
    assert t.scan().count() == 5
    # orphan cleanup on a fresh write dir finds nothing young
    orphans = t.remove_orphans(older_than_ms=0, dry_run=True)
    assert orphans == []


def test_statistics_and_partition_health(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    for i in range(3):
        t.append(_orders_df(spark, 10))
    stats = maintenance.collect_statistics(t, columns=["amount", "bucket"])
    assert stats["row_count"] == 30
    assert stats["columns"]["bucket"]["min"] == 0
    assert stats["columns"]["bucket"]["max"] == 6
    assert stats["columns"]["amount"]["null_count"] == 0
    recs = maintenance.analyze_partitions(t)
    assert any(r["recommendation"] == "compact" for r in recs)


def test_full_maintenance_cycle(spark, warehouse):
    t = LakeTable.create(spark, warehouse)
    for i in range(4):
        t.append(_orders_df(spark, 25))
    report = maintenance.run_full_maintenance(
        t, name="orders", sort_columns=["bucket"], retention_days=0
    )
    actions = [a["action"] for a in report.actions]
    assert actions == [
        "statistics",
        "compaction",
        "sort_rewrite",
        "expire_snapshots",
        "orphan_cleanup",
        "partition_health",
    ]
    assert t.scan().count() == 100


def test_zorder_rewrite_clusters_both_dims(spark, warehouse):
    """Z-order must shrink the per-file value range on BOTH columns;
    a linear sort only shrinks the leading one."""
    import json

    import pyarrow.parquet as pq
    import os

    t = LakeTable.create(spark, warehouse)
    df = spark.range(20_000).select(
        (F.col("id") % 141).cast("double").alias("x"),
        ((F.col("id") * 7919) % 131).cast("double").alias("y"),
    )
    t.append(df.repartition(8))

    def avg_ranges(tab):
        snap = tab.snapshot()
        spans = {"x": [], "y": []}
        for fe in snap.files:
            md = pq.ParquetFile(os.path.join(tab.root, fe.path))
            for col in ("x", "y"):
                idx = md.schema_arrow.get_field_index(col)
                lo = min(md.metadata.row_group(i).column(idx).statistics.min
                         for i in range(md.metadata.num_row_groups))
                hi = max(md.metadata.row_group(i).column(idx).statistics.max
                         for i in range(md.metadata.num_row_groups))
                spans[col].append(hi - lo)
        return {c: sum(v) / len(v) for c, v in spans.items()}

    before = avg_ranges(t)
    res = maintenance.rewrite_zorder(t, ["x", "y"], target_file_size=6 * 1024)
    assert res["status"] == "success"
    assert t.scan().count() == 20_000
    after = avg_ranges(t)
    # random layout: every file spans ~the full range of both columns;
    # z-ordered: both dims shrink substantially
    assert after["x"] < before["x"] * 0.6, (before, after)
    assert after["y"] < before["y"] * 0.65, (before, after)


def test_maintenance_rewrites_carry_occ_expected_base(spark, tmp_path, monkeypatch):
    """compact/rewrite_sorted/rewrite_zorder plan against a pinned
    snapshot and must commit with expected_base so a DML landing between
    plan and commit fails the rewrite instead of resurrecting rows."""
    t = LakeTable.create(spark, str(tmp_path / "t"))
    for i in range(3):  # several small files in one (unpartitioned) group
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, float(j), float(-j)) for j in range(4)],
                "order_id long, x double, y double",
            )
        )
    seen: list[int | None] = []
    real = LakeTable.replace_files

    def spy(self, remove, add_df, operation, summary=None,
            expected_base=None, writer_options=None):
        seen.append(expected_base)
        return real(
            self, remove, add_df, operation, summary=summary,
            expected_base=expected_base, writer_options=writer_options,
        )

    monkeypatch.setattr(LakeTable, "replace_files", spy)
    v0 = t.current_version()
    assert maintenance.compact(t)["status"] == "success"
    assert maintenance.rewrite_sorted(t, ["order_id"])["status"] == "success"
    assert maintenance.rewrite_zorder(t, ["x", "y"])["status"] == "success"
    assert seen == [v0, v0 + 1, v0 + 2]  # each pinned its planning snapshot


def test_concurrent_writers_occ_loser_retries(spark, tmp_path):
    """Two writers race: the one whose base moved underneath it REBASES
    its copy-on-write commit onto the new head (its replaced files are
    untouched — the other writer only appended) — no lost update, no
    resurrected rows, no manual re-plan needed."""
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(i, float(i)) for i in range(10)], "key long, amount double"))
    v1 = t.current_version()

    # writer A plans a DELETE against v1 (but does not commit yet)
    snap_a = t.snapshot()
    files_a = [f.path for f in snap_a.files]
    survivors_a = t._read_files(snap_a, files_a).filter("key >= 5")

    # writer B lands an append first
    t.append(spark.createDataFrame([(100, 1.0)], "key long, amount double"))
    assert t.current_version() == v1 + 1

    # writer A's commit rebases: B's append commutes with A's rewrite
    t.replace_files(files_a, survivors_a, operation="delete", expected_base=v1)
    keys = {r.key for r in t.scan().collect()}
    assert keys == {5, 6, 7, 8, 9, 100}  # B's append survived A's delete
    assert t.current_version() == v1 + 2  # both commits in the chain


def test_two_writer_append_race_both_survive(spark, tmp_path):
    """VERDICT r8 #7: multi-writer OCC at the catalog boundary. Two
    threads, each with its OWN LakeTable handle on the same root,
    append concurrently through a start barrier, many rounds. The CAS
    manifest create makes the race loser rebase+retry instead of
    clobbering: EVERY commit must survive, the snapshot history must be
    a gap-free linear chain, and the final row count must equal the sum
    of everything written."""
    import threading

    from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable

    root = str(tmp_path / "race")
    t0 = LakeTable.create(spark, root)
    t0.append(spark.createDataFrame([(0, "seed")], "id long, tag string"))

    n_writers, n_rounds = 3, 4
    barrier = threading.Barrier(n_writers)
    errors: list[Exception] = []

    def writer(w: int) -> None:
        t = LakeTable.load(spark, root)
        for r in range(n_rounds):
            df = spark.createDataFrame(
                [(w * 1000 + r, f"w{w}r{r}")], "id long, tag string"
            )
            try:
                barrier.wait(timeout=60)
                t.append(df, operation=f"append_w{w}")
            except Exception as exc:  # noqa: BLE001 — assert after join
                errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors

    t = LakeTable.load(spark, root)
    # every commit survived: create + seed + n_writers*n_rounds appends
    assert t.current_version() == 1 + n_writers * n_rounds
    # linearizable history: versions are a gap-free chain and every
    # writer's every round is present exactly once
    rows = t.scan().collect()
    ids = sorted(r["id"] for r in rows)
    expect = sorted(
        [0] + [w * 1000 + r for w in range(n_writers) for r in range(n_rounds)]
    )
    assert ids == expect
    versions = [
        r["version"] for r in t.snapshots_df().orderBy("version").collect()
    ]
    assert versions == list(range(1 + 1 + n_writers * n_rounds))
    # row counts are monotone along the chain (append-only history)
    counts = [
        sum(f.rows for f in t.snapshot(v).files) for v in versions
    ]
    assert counts == sorted(counts)


def test_two_writer_publish_race_rebases(spark, tmp_path):
    """Two staged WAP batches published concurrently: both must land
    (cherry-pick rebase), never clobber."""
    import threading

    from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable

    root = str(tmp_path / "race_pub")
    t0 = LakeTable.create(spark, root)
    t0.append(spark.createDataFrame([(0,)], "id long"))
    waps = [
        LakeTable.load(spark, root).stage_append(
            spark.createDataFrame([(i,)], "id long")
        )
        for i in (1, 2)
    ]
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def pub(wap: str) -> None:
        t = LakeTable.load(spark, root)
        try:
            barrier.wait(timeout=60)
            t.publish(wap)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=pub, args=(w,)) for w in waps]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    t = LakeTable.load(spark, root)
    assert sorted(r["id"] for r in t.scan().collect()) == [0, 1, 2]


def test_replace_files_rebases_over_disjoint_commits(spark, tmp_path):
    """Copy-on-write commits REBASE over concurrent commits that don't
    touch the replaced files (Iceberg snapshot-isolation validation):
    a concurrent append commutes — both effects land. A concurrent
    rewrite of the SAME file is a real conflict and still raises."""
    import pytest as _pytest

    from de_gcp_lakehouse_iceberg_spark.lakehouse import (
        CommitConflict,
        LakeTable,
    )

    root = str(tmp_path / "race_cow")
    t = LakeTable.create(spark, root)
    t.append(spark.createDataFrame([(1,), (2,)], "id long"))
    v = t.current_version()
    files = [f.path for f in t.snapshot(v).files]
    # a concurrent append moves the head — the rewrite planned at v
    # must rebase and keep BOTH effects
    t.append(spark.createDataFrame([(3,)], "id long"))
    t.replace_files(
        files,
        spark.createDataFrame([(9,)], "id long"),
        operation="rewrite",
        expected_base=v,
    )
    assert sorted(r["id"] for r in t.scan().collect()) == [3, 9]

    # overlapping rewrite: plan two rewrites of the same (new) file set;
    # the second must CONFLICT, winner intact
    v2 = t.current_version()
    files2 = [f.path for f in t.snapshot(v2).files]
    t.replace_files(
        files2,
        spark.createDataFrame([(20,)], "id long"),
        operation="rewrite",
        expected_base=v2,
    )
    with _pytest.raises(CommitConflict, match="rewritten or removed"):
        t.replace_files(
            files2,
            spark.createDataFrame([(30,)], "id long"),
            operation="rewrite",
            expected_base=v2,
        )
    assert sorted(r["id"] for r in t.scan().collect()) == [20]


def test_concurrent_disjoint_merges_both_commit(spark, tmp_path):
    """Two MERGEs planned against the same base, each matching rows in
    a DIFFERENT file: both must commit (the r9 engine serialized them
    — any concurrent commit aborted the CoW loser). Overlapping MERGEs
    (same file) must still conflict."""
    import pytest as _pytest

    from de_gcp_lakehouse_iceberg_spark.lakehouse import (
        CommitConflict,
        LakeTable,
    )
    from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import merge

    root = str(tmp_path / "race_merge")
    t = LakeTable.create(spark, root)
    # two files: ids 1-2 and ids 11-12 (separate appends → separate files)
    t.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"))
    t.append(spark.createDataFrame([(11, 110.0), (12, 120.0)], "id long, v double"))
    v = t.current_version()

    # both merges planned (implicitly) against v; merge() pins its own
    # snapshot at call time, so run the first fully, then the second —
    # the second's plan happens AFTER the first commit here, so instead
    # simulate true concurrency with two pre-planned handles:
    t1 = LakeTable.load(spark, root)
    t2 = LakeTable.load(spark, root)
    src_a = spark.createDataFrame([(1, 99.0)], "id long, v double")
    src_b = spark.createDataFrame([(11, 999.0)], "id long, v double")

    # interleave: plan A (pins v), plan B (pins v) — commit A, commit B.
    # merge() plans and commits internally; calling B after A's commit
    # exercises the rebase path because B's expected_base == v is stale.
    import threading

    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def run(handle, src):
        try:
            barrier.wait(timeout=120)
            merge(handle, src, on=["id"],
                  when_matched_update={"v": "source.v"},
                  when_not_matched_insert=False)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    th = [
        threading.Thread(target=run, args=(t1, src_a)),
        threading.Thread(target=run, args=(t2, src_b)),
    ]
    for x in th:
        x.start()
    for x in th:
        x.join(timeout=300)
    assert not errs, errs
    got = {r.id: r.v for r in t.scan().collect()}
    assert got == {1: 99.0, 2: 20.0, 11: 999.0, 12: 120.0}
    # exactly two merge commits landed on top of v
    assert t.current_version() == v + 2

    # OVERLAPPING merges: same target file — loser must conflict
    v2 = t.current_version()
    ta = LakeTable.load(spark, root)
    tb = LakeTable.load(spark, root)
    files_before = {f.path for f in t.snapshot(v2).files}
    merge(ta, spark.createDataFrame([(1, 111.0)], "id long, v double"),
          on=["id"], when_matched_update={"v": "source.v"},
          when_not_matched_insert=False)
    # tb plans against v2 via replace_files' expected_base — drive the
    # conflict deterministically through replace_files itself
    target_file = sorted(
        f.path for f in t.snapshot(v2).files if f.path not in
        {f2.path for f2 in t.snapshot().files}
    )
    assert target_file, "first merge should have rewritten a file"
    with _pytest.raises(CommitConflict, match="rewritten or removed"):
        tb.replace_files(
            target_file,
            spark.createDataFrame([(1, 222.0)], "id long, v double"),
            operation="merge",
            expected_base=v2,
        )
    assert {r.v for r in t.scan().filter("id = 1").collect()} == {111.0}


def test_cow_rebase_reapplies_new_mor_delete(spark, tmp_path):
    """A merge-on-read delete landing between plan and commit applies
    to files the CoW commit rewrites: committing the stale plan
    verbatim would RESURRECT the deleted rows (the replacement files
    outrank the delete entry's sequence number). The rebase instead
    RE-FILTERS the replacement output with the new predicate
    (Iceberg's validate-then-reapply) — both effects land, serialized
    delete-last."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
    from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import delete_mor

    root = str(tmp_path / "mor_race")
    t = LakeTable.create(spark, root)
    t.append(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "id long, v double"
        ).coalesce(1)
    )
    v1_files = {f.path for f in t.snapshot().files}
    t.append(spark.createDataFrame([(11, 110.0)], "id long, v double"))
    v = t.current_version()
    file_a = sorted(v1_files)  # the single file holding ids 1 and 2

    # plan a rewrite of file_a against v; a MOR delete lands first —
    # the replacement even tries to write id=2 back with a new value,
    # proving the reapply filters the OUTPUT, not just the old file
    delete_mor(t, "id = 2")
    t.replace_files(
        file_a,
        spark.createDataFrame(
            [(1, 99.0), (2, 22.0)], "id long, v double"
        ),
        operation="update",
        expected_base=v,
    )
    # both effects survive: the update to id=1 AND the delete of id=2
    assert {(r.id, r.v) for r in t.scan().collect()} == {
        (1, 99.0), (11, 110.0)
    }

    # a plain append between plan and commit still commutes: the
    # delete entries at head are unchanged since the new base
    v2 = t.current_version()
    files_now = [
        f.path for f in t.snapshot(v2).files if f.path in set(file_a)
    ]
    t.append(spark.createDataFrame([(21, 210.0)], "id long, v double"))
    t.replace_files(
        files_now,
        spark.createDataFrame([(1, 99.0)], "id long, v double"),
        operation="update",
        expected_base=v2,
    )
    assert {(r.id, r.v) for r in t.scan().collect()} == {
        (1, 99.0), (11, 110.0), (21, 210.0)
    }


def test_crashed_writer_does_not_block_commits(spark, tmp_path):
    """The CAS-linked manifest is the commit point; the pointer file is
    a hint. A writer that crashes between link and hint swap must
    neither hide its (committed) version nor block the slot for every
    later writer."""
    import json
    import os

    from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable

    root = str(tmp_path / "crashed")
    t = LakeTable.create(spark, root)
    t.append(spark.createDataFrame([(1,), (2,)], "id long"))
    v = t.current_version()
    # simulate the crash: a fully-written manifest for v+1 (same file
    # set, one op marker) with NO pointer swap
    mdir = os.path.join(root, "_manifests")
    with open(os.path.join(mdir, f"v{v:08d}.json")) as f:
        snap = json.load(f)
    snap["version"] = v + 1
    snap["operation"] = "crashed_append"
    with open(os.path.join(mdir, f"v{v + 1:08d}.json"), "w") as f:
        json.dump(snap, f)
    assert int(open(os.path.join(root, "_current")).read()) == v

    t2 = LakeTable.load(spark, root)
    # the linked manifest IS committed and visible…
    assert t2.current_version() == v + 1
    assert t2.snapshot().operation == "crashed_append"
    # …and new commits proceed past it instead of conflicting forever
    t2.append(spark.createDataFrame([(3,)], "id long"))
    assert t2.current_version() == v + 2
    assert sorted(r["id"] for r in t2.scan().collect()) == [1, 2, 3]


def test_stale_pointer_hint_cannot_regress_the_head(spark, tmp_path):
    """A stale hint write (slow writer losing the swap race) must not
    make committed versions invisible: the head walks forward through
    existing manifests."""
    import os

    from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable

    root = str(tmp_path / "stale_hint")
    t = LakeTable.create(spark, root)
    t.append(spark.createDataFrame([(1,)], "id long"))
    t.append(spark.createDataFrame([(2,)], "id long"))
    head = t.current_version()
    # regress the hint
    with open(os.path.join(root, "_current"), "w") as f:
        f.write("0")
    t2 = LakeTable.load(spark, root)
    assert t2.current_version() == head
    assert sorted(r["id"] for r in t2.scan().collect()) == [1, 2]


def test_stale_hint_repaired_after_fallback_scan(spark, tmp_path):
    """r10 ADVICE: when the hinted manifest is GONE (stale hint from a
    crashed writer landing after expire_snapshots), the fallback
    directory scan must REPAIR the on-disk hint — otherwise every
    subsequent read repeats the full listdir until the next commit."""
    import os

    from de_gcp_lakehouse_iceberg_spark.lakehouse.table import (
        POINTER,
        LakeTable,
    )

    t = LakeTable.create(spark, str(tmp_path / "stale_hint"))
    for i in range(3):
        t.append(spark.range(i, i + 2).toDF("id"))
    head = t.current_version()
    # simulate the crash interleaving: hint points at a version whose
    # manifest no longer exists
    pointer = os.path.join(t.root, POINTER)
    with open(pointer, "w") as f:
        f.write(str(head + 40))
    assert t.current_version() == head  # fallback scan found the head
    with open(pointer) as f:
        assert f.read().strip() == str(head)  # ...and repaired the hint
