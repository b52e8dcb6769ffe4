"""Merge-on-read deletes (lakehouse/dml.delete_mor) — Iceberg v2
equality-delete semantics on the LakeTable snapshot layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import (
    changelog,
    delete,
    delete_mor,
    materialize_deletes,
    update,
)


def _t(spark, tmp_path, n=20):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("cat")
        )
    )
    return t


def test_mor_delete_is_metadata_only_and_filters_reads(spark, tmp_path):
    t = _t(spark, tmp_path)
    files_before = {f.path for f in t.snapshot().files}
    snap = delete_mor(t, "cat = 1")
    assert snap.operation == "delete_mor"
    # zero data movement: identical file set
    assert {f.path for f in t.snapshot().files} == files_before
    assert t.scan().count() == 15
    assert t.scan().filter("cat = 1").count() == 0
    # time travel still sees the pre-delete rows
    assert t.scan(version=snap.version - 1).count() == 20


def test_mor_delete_not_retroactive_for_new_appends(spark, tmp_path):
    t = _t(spark, tmp_path)
    delete_mor(t, "cat = 1")
    # rows appended AFTER the delete survive even when they match it
    t.append(
        spark.createDataFrame([(100, 1), (101, 2)], "k long, cat long")
    )
    ks = {r.k for r in t.scan().collect()}
    assert 100 in ks and 101 in ks
    assert t.scan().count() == 17


def test_mor_stacked_deletes_and_materialization(spark, tmp_path):
    t = _t(spark, tmp_path)
    delete_mor(t, "cat = 1")
    delete_mor(t, "k >= 16")
    assert t.scan().count() == 20 - 5 - 3   # cat1: 5 (k<16), k>=16: 4, overlap k=17
    assert len(t.snapshot().deletes) == 2

    snap = materialize_deletes(t)
    assert snap.operation == "materialize_deletes"
    # entries GC'd: every surviving file now postdates the deletes
    assert t.snapshot().deletes == []
    assert t.scan().count() == 12
    assert t.scan().filter("cat = 1 AND k < 100").count() == 0


def test_mor_then_cow_rewrite_does_not_resurrect(spark, tmp_path):
    """A CoW UPDATE rewriting a file with pending MOR deletes must not
    resurrect the logically deleted rows (rewritten file gets a new
    seq, so the delete no longer applies to it — the rewrite must have
    applied it physically)."""
    t = _t(spark, tmp_path)
    delete_mor(t, "cat = 1")
    update(t, {"cat": F.lit(9).cast("long")}, F.col("k") == 0)
    assert t.scan().filter("cat = 1").count() == 0
    assert t.scan().count() == 15
    assert t.scan().filter("k = 0").collect()[0].cat == 9

    # CoW delete composes the same way
    delete(t, F.col("cat") == 2)
    assert t.scan().count() == 10


def test_mor_delete_null_predicate_rows_kept(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 5), (2, None), (3, 50)], "k long, v long"
        )
    )
    delete_mor(t, "v > 10")
    ks = {r.k for r in t.scan().collect()}
    assert ks == {1, 2}                    # NULL predicate ⇒ kept


def test_mor_delete_rejects_bad_predicate(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(Exception):
        delete_mor(t, "no_such_column = 1")
    assert t.snapshot().deletes == []


def test_mor_changelog_emits_deletes_once(spark, tmp_path):
    """DELETE rows surface at the delete_mor commit itself (the
    logical deletion point); the later materialization rewrite diffs
    to no net change, so nothing is double-emitted."""
    t = _t(spark, tmp_path, n=8)
    delete_mor(t, "cat = 1")               # v2
    materialize_deletes(t)                 # v3
    ch = changelog(t, 1, t.current_version()).collect()
    dels = [(r.k, r._change_version) for r in ch
            if r._change_type == "DELETE"]
    assert sorted(dels) == [(1, 2), (5, 2)]
    assert not [r for r in ch if r._change_type == "INSERT"]


def test_mor_rollback_restores_delete_entries(spark, tmp_path):
    t = _t(spark, tmp_path)
    v_clean = t.current_version()
    delete_mor(t, "cat = 1")
    v_deleted = t.current_version()
    t.rollback_to(v_clean)
    assert t.scan().count() == 20          # delete reverted
    t.rollback_to(v_deleted)
    assert t.scan().count() == 15          # delete restored with entry
    assert len(t.snapshot().deletes) == 1


def test_mor_update_single_atomic_commit(spark, tmp_path):
    from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import update_mor

    t = _t(spark, tmp_path)
    v_before = t.current_version()
    files_before = {f.path for f in t.snapshot().files}

    update_mor(t, {"cat": F.lit(99).cast("long")}, "k >= 15")
    assert t.current_version() == v_before + 1      # ONE commit
    # no pre-existing file rewritten — only additions
    assert files_before <= {f.path for f in t.snapshot().files}

    rows = {r.k: r.cat for r in t.scan().collect()}
    assert len(rows) == 20                          # count preserved
    assert all(rows[k] == 99 for k in range(15, 20))
    assert all(rows[k] == k % 4 for k in range(15))

    # appends after the update are untouched by its delete entry
    t.append(spark.createDataFrame([(15, 1)], "k long, cat long"))
    vals = sorted(
        r.cat for r in t.scan().filter("k = 15").collect()
    )
    assert vals == [1, 99]

    # materialization folds everything down with no logical change
    materialize_deletes(t)
    assert t.snapshot().deletes == []
    assert sorted(
        r.cat for r in t.scan().filter("k = 15").collect()
    ) == [1, 99]
    assert t.scan().count() == 21


def test_mor_update_null_predicate_rows_untouched(spark, tmp_path):
    from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import update_mor

    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 5), (2, None), (3, 50)], "k long, v long"
        )
    )
    update_mor(t, {"v": F.lit(0).cast("long")}, "v > 10")
    rows = {r.k: r.v for r in t.scan().collect()}
    assert rows == {1: 5, 2: None, 3: 0}


def test_fast_count_metadata_only_and_mor_aware(spark, tmp_path):
    t = _t(spark, tmp_path)
    assert t.fast_count() == 20                     # zero data read
    assert t.fast_count(
        partition_filter=lambda p: True
    ) == 20
    delete_mor(t, "cat = 1")
    assert t.fast_count() is None                   # cannot answer exactly
    assert t.scan().count() == 15                   # fallback path
    materialize_deletes(t)
    assert t.fast_count() == 15                     # exact again


def test_mor_delete_equals_filter_property(spark, tmp_path):
    """Property: for random data and random predicates, the MOR-deleted
    table content equals the plain filtered content, and stacking the
    delete with later appends keeps the partition: old rows filtered,
    new rows verbatim."""
    from hypothesis import given, settings, strategies as st

    base = str(tmp_path)
    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(st.integers(0, 50), st.integers(-5, 5)),
            min_size=1, max_size=30, unique_by=lambda x: x[0],
        ),
        bound=st.integers(-5, 5),
        late=st.lists(
            st.tuples(st.integers(100, 120), st.integers(-5, 5)),
            max_size=5, unique_by=lambda x: x[0],
        ),
    )
    def check(vals, bound, late):
        counter[0] += 1
        t = LakeTable.create(spark, f"{base}/t{counter[0]}")
        t.append(spark.createDataFrame(vals, "k long, v long"))
        delete_mor(t, f"v >= {bound}")
        t.append(spark.createDataFrame(late, "k long, v long")) if late \
            else None
        got = {(r.k, r.v) for r in t.scan().collect()}
        want = {(k, v) for k, v in vals if not (v >= bound)} | set(late)
        assert got == want

    check()


def test_update_mor_changelog_emits_delete_and_insert(spark, tmp_path):
    """An update_mor commit must emit BOTH sides of the update: DELETE
    for every pre-update row version and INSERT for every rewritten
    version — a CDC consumer that only saw the INSERTs would
    double-count updated rows, and key-changing updates would never
    remove the old key downstream."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import update_mor

    t = _t(spark, tmp_path, n=8)           # v1: k 0..7, cat = k % 4
    update_mor(t, {"cat": F.lit(9)}, "cat = 1")          # v2: k 1, 5
    v = t.current_version()
    ch = changelog(t, 1, v).collect()
    dels = sorted((r.k, r.cat) for r in ch if r._change_type == "DELETE")
    ins = sorted((r.k, r.cat) for r in ch if r._change_type == "INSERT")
    assert dels == [(1, 1), (5, 1)]        # old versions leave
    assert ins == [(1, 9), (5, 9)]         # new versions arrive
    # materialization adds nothing new
    materialize_deletes(t)
    ch2 = changelog(t, 1, t.current_version()).collect()
    assert len(ch2) == len(ch)


def test_update_mor_key_change_replicates(spark, tmp_path):
    """apply_changelog on an update_mor feed converges even when the
    update rewrites a KEY column (old-key row must disappear)."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse.dml import (
        apply_changelog,
        update_mor,
    )

    t = _t(spark, tmp_path, n=6)           # v1
    replica = LakeTable.create(spark, str(tmp_path / "replica"))
    replica.append(t.scan())               # bootstrap at v1
    base = t.current_version()
    update_mor(t, {"k": F.col("k") + 100}, "k = 2")      # key 2 -> 102
    apply_changelog(replica, changelog(t, base, t.current_version()), ["k"])
    src = sorted((r.k, r.cat) for r in t.scan().collect())
    dst = sorted((r.k, r.cat) for r in replica.scan().collect())
    assert src == dst
    assert (102, 2) in dst and all(k != 2 for k, _ in dst)


def test_mor_delete_lands_mid_merge_both_effects_survive(spark, tmp_path):
    """Two-writer interleaving at the commit point (r10 VERDICT #6): a
    MOR delete lands AFTER a MERGE has planned and written its output
    but BEFORE its CAS. The MERGE must lose the slot, rebase, re-filter
    its output with the new delete predicate, and commit — final state
    shows the merge's updates AND the delete, serialized delete-last."""
    from pyspark.sql import functions as F

    from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml
    from de_gcp_lakehouse_iceberg_spark.lakehouse.committer import (
        Committer,
        PosixLinkCommitter,
    )

    root = str(tmp_path / "midmerge")
    t = LakeTable.create(spark, root)
    t.append(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double"
        ).coalesce(1)
    )
    other = LakeTable.load(spark, root)

    class _InjectBeforeCas(Committer):
        """Fires a hook (the other writer's commit) immediately before
        this writer's FIRST manifest CAS — the deterministic version
        of 'the delete raced in mid-merge'."""

        def __init__(self, inner, hook):
            self.inner, self.hook, self.fired = inner, hook, False

        def cas_create(self, path, payload):
            if not self.fired:
                self.fired = True
                self.hook()
            return self.inner.cas_create(path, payload)

        def set_hint(self, path, value):
            self.inner.set_hint(path, value)

        def read_hint(self, path):
            return self.inner.read_hint(path)

    t.committer = _InjectBeforeCas(
        PosixLinkCommitter(), lambda: dml.delete_mor(other, "id = 2")
    )
    src = spark.createDataFrame(
        [(2, 222.0), (3, 333.0)], "id long, v double"
    )
    dml.merge(
        t,
        src,
        on=["id"],
        when_matched_update={"v": F.col("source.v")},
        when_not_matched_insert=False,
    )
    # merge's update to id=3 AND the concurrent delete of id=2 survive;
    # the merge's own rewrite of id=2 did not resurrect it
    final = LakeTable.load(spark, root)
    assert {(r.id, r.v) for r in final.scan().collect()} == {
        (1, 10.0), (3, 333.0)
    }
