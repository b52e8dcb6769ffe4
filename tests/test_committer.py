"""Committer abstraction (lakehouse/committer.py): the CAS commit
point and pointer hint behind LakeTable OCC, plus crash fault
injection and hint-repair amortization (VERDICT r9 #4/#8, ADVICE r9
expire-vs-stale-hint)."""

from __future__ import annotations

import os
import threading

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.committer import (
    PosixLinkCommitter,
)


def test_cas_create_exactly_one_winner(tmp_path):
    c = PosixLinkCommitter()
    path = str(tmp_path / "v00000001.json")
    assert c.cas_create(path, "winner") is True
    assert c.cas_create(path, "loser") is False
    with open(path) as f:
        assert f.read() == "winner"
    # no .tmp litter from either attempt
    assert [p for p in os.listdir(tmp_path) if p.endswith(".tmp")] == []


def test_cas_create_threaded_contention(tmp_path):
    """N threads race one slot: exactly one True, payload intact."""
    c = PosixLinkCommitter()
    path = str(tmp_path / "slot.json")
    barrier = threading.Barrier(8)
    wins: list[int] = []

    def attempt(i: int) -> None:
        barrier.wait(timeout=60)
        if c.cas_create(path, f"writer-{i}"):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert len(wins) == 1
    with open(path) as f:
        assert f.read() == f"writer-{wins[0]}"


def test_hint_roundtrip(tmp_path):
    c = PosixLinkCommitter()
    p = str(tmp_path / "_current")
    assert c.read_hint(p) is None
    c.set_hint(p, "7")
    assert c.read_hint(p) == "7"
    c.set_hint(p, "8")  # replace, atomically
    assert c.read_hint(p) == "8"


class _CrashAfterCAS(PosixLinkCommitter):
    """Fault injection: die between the manifest CAS (commit point)
    and the pointer hint swap — the classic crashed-writer window."""

    def __init__(self):
        self.crash_next_hint = False

    def set_hint(self, path: str, value: str) -> None:
        if self.crash_next_hint:
            self.crash_next_hint = False
            raise RuntimeError("injected crash between CAS and hint swap")
        super().set_hint(path, value)


def test_crash_between_cas_and_hint_swap(spark, tmp_path):
    """The manifest IS the commit: a writer crashing before the hint
    swap leaves a durable commit that every later reader resolves and
    every later writer builds on (no blocked slot, no lost commit)."""
    import pytest

    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root)
    t.append(spark.createDataFrame([(1,)], "id long"))
    v = t.current_version()

    t.committer = _CrashAfterCAS()
    t.committer.crash_next_hint = True
    with pytest.raises(RuntimeError, match="injected crash"):
        t.append(spark.createDataFrame([(2,)], "id long"))

    # fresh handle (vanilla committer): the crashed append IS committed
    t2 = LakeTable.load(spark, root)
    assert t2.current_version() == v + 1
    assert sorted(r.id for r in t2.scan().collect()) == [1, 2]
    # and the next commit proceeds normally, repairing the hint
    t2.append(spark.createDataFrame([(3,)], "id long"))
    assert t2.current_version() == v + 2
    with open(os.path.join(root, "_current")) as f:
        assert int(f.read()) == v + 2


def test_multiwriter_contention_all_commits_survive(spark, tmp_path):
    """4 writers × 3 rounds through independent handles: every commit
    lands (gap-free chain), no lost update — >2-writer contention on
    the CAS primitive (VERDICT r9 #4 fault-injection scope)."""
    root = str(tmp_path / "mw")
    t0 = LakeTable.create(spark, root)
    t0.append(spark.createDataFrame([(0, -1)], "id long, w long"))
    base = t0.current_version()

    n_writers, n_rounds = 4, 3
    barrier = threading.Barrier(n_writers)
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            t = LakeTable.load(spark, root)
            for r in range(n_rounds):
                barrier.wait(timeout=120)
                t.append(
                    spark.createDataFrame(
                        [(w * 100 + r, w)], "id long, w long"
                    ),
                    operation=f"w{w}_r{r}",
                )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors
    t = LakeTable.load(spark, root)
    assert t.current_version() == base + n_writers * n_rounds
    assert t.scan().count() == 1 + n_writers * n_rounds
    # gap-free chain: every version readable
    for v in range(t.current_version() + 1):
        t.snapshot(v)


def test_stale_pointer_walk_is_amortized_o1(spark, tmp_path):
    """A pointer left far behind the head (crashed writer) costs ONE
    walk: the first read repairs the hint, so later cold reads are
    back to a constant number of existence probes."""
    root = str(tmp_path / "stale")
    t = LakeTable.create(spark, root)
    # 40 cheap metadata-only commits to open a wide gap
    snap = t.snapshot()
    for _ in range(40):
        snap = t._commit_snapshot(
            operation="noop",
            files=snap.files,
            schema_json=snap.schema_json,
            base=t.current_version(),
        )
    head = t.current_version()
    # regress the hint to 0 (simulates the stale-hint crash window)
    t.committer.set_hint(os.path.join(root, "_current"), "0")

    assert t.current_version() == head  # walks the gap once...
    with open(os.path.join(root, "_current")) as f:
        assert int(f.read()) == head  # ...and repaired the hint

    probes = []
    real_exists = os.path.exists

    def counting_exists(p):
        probes.append(p)
        return real_exists(p)

    import unittest.mock as mock

    with mock.patch(
        "de_gcp_lakehouse_iceberg_spark.lakehouse.table.os.path.exists",
        side_effect=counting_exists,
    ):
        assert t.current_version() == head
    # steady state: hint-existence check + one probe past the head
    assert len(probes) <= 2, probes


def test_expire_with_stale_hint_resolves_true_head(spark, tmp_path):
    """ADVICE r9: expire_snapshots refreshes the pointer before
    deleting manifests, and even a hint regressed INTO the expired
    range afterwards (slow reader's late set_hint) falls back to a
    directory scan instead of resolving an expired head."""
    root = str(tmp_path / "exp")
    t = LakeTable.create(spark, root)
    for i in range(6):
        t.append(spark.createDataFrame([(i,)], "id long"))
    head = t.current_version()
    # stale hint from a crashed writer, THEN expire drops the old tail
    t.committer.set_hint(os.path.join(root, "_current"), "1")
    t.expire_snapshots(older_than_ms=None, keep_last=2)
    with open(os.path.join(root, "_current")) as f:
        assert int(f.read()) == head  # refreshed before deletion
    assert t.current_version() == head

    # a slow reader's stale hint landing AFTER the expire: the hinted
    # manifest is gone — the reader must scan, not error or regress
    t.committer.set_hint(os.path.join(root, "_current"), "1")
    assert LakeTable.load(spark, root).current_version() == head
    assert t.scan().count() == 6
