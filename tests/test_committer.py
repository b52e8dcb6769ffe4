"""Committer abstraction (lakehouse/committer.py): the CAS commit
point and pointer hint behind LakeTable OCC, plus crash fault
injection and hint-repair amortization (VERDICT r9 #4/#8, r10 #3).

Every contract test here runs PARAMETRICALLY over BOTH strategies —
the POSIX hard-link CAS and the conditional-PUT object-store route
(GCS/S3 semantics: 412 conflicts, unconditional hint PUT, and the
lost-response timeout ambiguity that `os.link` can never produce) —
so the OCC machinery is proven against two implementations' failure
modes, not one."""

from __future__ import annotations

import os
import threading

import pytest

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.committer import (
    Committer,
    ConditionalPutCommitter,
    LocalObjectStore,
    PosixLinkCommitter,
)

STRATEGIES = ["posix", "condput"]


@pytest.fixture(params=STRATEGIES)
def make_committer(request):
    """Factory producing committer handles of one strategy. For
    condput every handle shares ONE store instance — the way racing
    writers share a bucket."""
    if request.param == "posix":
        return lambda: PosixLinkCommitter()
    store = LocalObjectStore()
    return lambda: ConditionalPutCommitter(store)


def test_cas_create_exactly_one_winner(tmp_path, make_committer):
    c = make_committer()
    path = str(tmp_path / "v00000001.json")
    assert c.cas_create(path, "winner") is True
    assert c.cas_create(path, "loser") is False
    with open(path) as f:
        assert f.read() == "winner"
    # no .tmp litter from either attempt
    assert [p for p in os.listdir(tmp_path) if p.endswith(".tmp")] == []


def test_cas_create_threaded_contention(tmp_path, make_committer):
    """N threads race one slot through independent handles: exactly
    one True, payload intact."""
    path = str(tmp_path / "slot.json")
    barrier = threading.Barrier(8)
    wins: list[int] = []

    def attempt(i: int) -> None:
        c = make_committer()
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


def test_hint_roundtrip(tmp_path, make_committer):
    c = make_committer()
    p = str(tmp_path / "_current")
    assert c.read_hint(p) is None
    c.set_hint(p, "7")
    assert c.read_hint(p) == "7"
    c.set_hint(p, "8")  # replace, atomically
    assert c.read_hint(p) == "8"


# ---------------------------------------------------------------------------
# conditional-PUT-specific contract: the lost-response ambiguity
# ---------------------------------------------------------------------------
def test_condput_ambiguous_success_is_resolved_as_win(tmp_path):
    """A PUT that LANDS but times out: the retry path (read-back
    compare) must claim the win — and a competitor probing the same
    slot must lose."""
    store = LocalObjectStore()
    us, them = ConditionalPutCommitter(store), ConditionalPutCommitter(store)
    path = str(tmp_path / "v1.json")
    store.timeout_next_put = True
    assert us.cas_create(path, "ours") is True  # landed, response lost
    assert them.cas_create(path, "theirs") is False
    # idempotent retry of OUR attempt (same payload) still claims it
    assert us.cas_create(path, "ours") is True
    assert store.generation(path) == 1  # never overwritten


def test_condput_dropped_put_leaves_slot_free(tmp_path):
    """A PUT lost BEFORE the server: cas reports no win, the slot
    stays free, and a plain retry claims it."""
    store = LocalObjectStore()
    c = ConditionalPutCommitter(store)
    path = str(tmp_path / "v1.json")
    store.drop_next_put = True
    assert c.cas_create(path, "ours") is False  # ambiguous -> not ours
    assert not os.path.exists(path)
    assert c.cas_create(path, "ours") is True  # retry wins cleanly


def test_condput_hint_is_last_writer_wins(tmp_path):
    store = LocalObjectStore()
    c = ConditionalPutCommitter(store)
    p = str(tmp_path / "_current")
    c.set_hint(p, "3")
    c.set_hint(p, "9")
    assert c.read_hint(p) == "9"
    assert store.generation(p) == 2


# ---------------------------------------------------------------------------
# LakeTable OCC suite over both strategies
# ---------------------------------------------------------------------------
class _CrashOnHint(Committer):
    """Fault injection: die between the manifest CAS (commit point)
    and the pointer hint swap — the classic crashed-writer window.
    Wraps ANY strategy."""

    def __init__(self, inner: Committer):
        self.inner = inner
        self.crash_next_hint = False

    def cas_create(self, path: str, payload: str) -> bool:
        return self.inner.cas_create(path, payload)

    def set_hint(self, path: str, value: str) -> None:
        if self.crash_next_hint:
            self.crash_next_hint = False
            raise RuntimeError("injected crash between CAS and hint swap")
        self.inner.set_hint(path, value)

    def read_hint(self, path: str) -> str | None:
        return self.inner.read_hint(path)


def test_crash_between_cas_and_hint_swap(spark, tmp_path, make_committer):
    """The manifest IS the commit: a writer crashing before the hint
    swap leaves a durable commit that every later reader resolves and
    every later writer builds on (no blocked slot, no lost commit)."""
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root)
    t.committer = make_committer()
    t.append(spark.createDataFrame([(1,)], "id long"))
    v = t.current_version()

    t.committer = _CrashOnHint(make_committer())
    t.committer.crash_next_hint = True
    with pytest.raises(RuntimeError, match="injected crash"):
        t.append(spark.createDataFrame([(2,)], "id long"))

    # fresh handle: the crashed append IS committed
    t2 = LakeTable.load(spark, root)
    t2.committer = make_committer()
    assert t2.current_version() == v + 1
    assert sorted(r.id for r in t2.scan().collect()) == [1, 2]
    # and the next commit proceeds normally, repairing the hint
    t2.append(spark.createDataFrame([(3,)], "id long"))
    assert t2.current_version() == v + 2
    with open(os.path.join(root, "_current")) as f:
        assert int(f.read()) == v + 2


def test_multiwriter_contention_all_commits_survive(
    spark, tmp_path, make_committer
):
    """4 writers × 3 rounds through independent handles: every commit
    lands (gap-free chain), no lost update — >2-writer contention on
    the CAS primitive (VERDICT r9 #4 fault-injection scope)."""
    root = str(tmp_path / "mw")
    t0 = LakeTable.create(spark, root)
    t0.committer = make_committer()
    t0.append(spark.createDataFrame([(0, -1)], "id long, w long"))
    base = t0.current_version()

    n_writers, n_rounds = 4, 3
    barrier = threading.Barrier(n_writers)
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            t = LakeTable.load(spark, root)
            t.committer = make_committer()
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
    t.committer = make_committer()
    assert t.current_version() == base + n_writers * n_rounds
    assert t.scan().count() == 1 + n_writers * n_rounds
    # gap-free chain: every version readable
    for v in range(t.current_version() + 1):
        t.snapshot(v)


def test_concurrent_disjoint_merges_both_commit(
    spark, tmp_path, make_committer
):
    """The q116 shape against both strategies: two concurrent MERGEs
    touching DISJOINT key ranges must both land (the loser
    rebase-validates and retries), final state reflecting both."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse import dml

    root = str(tmp_path / "cm")
    t0 = LakeTable.create(spark, root)
    t0.committer = make_committer()
    t0.append(
        spark.range(0, 20).selectExpr("id AS k", "CAST(0 AS LONG) AS v")
    )
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def merger(lo: int, hi: int, tag: int) -> None:
        try:
            t = LakeTable.load(spark, root)
            t.committer = make_committer()
            src = spark.range(lo, hi).selectExpr(
                "id AS k", f"CAST({tag} AS LONG) AS v"
            )
            from pyspark.sql import functions as F

            barrier.wait(timeout=120)
            dml.merge(
                t,
                src,
                on=["k"],
                when_matched_update={"v": F.col("source.v")},
                when_not_matched_insert=False,
            )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=merger, args=(0, 10, 1)),
        threading.Thread(target=merger, args=(10, 20, 2)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors
    t = LakeTable.load(spark, root)
    t.committer = make_committer()
    got = {r.k: r.v for r in t.scan().collect()}
    assert got == {k: (1 if k < 10 else 2) for k in range(20)}


def test_ambiguous_timeout_mid_append_commits_once(spark, tmp_path):
    """Conditional-PUT end-to-end: an append whose manifest PUT lands
    but times out must still produce EXACTLY ONE committed version
    (the read-back resolution claims the win instead of raising a
    spurious conflict or double-committing)."""
    store = LocalObjectStore()
    root = str(tmp_path / "amb")
    t = LakeTable.create(spark, root)
    t.committer = ConditionalPutCommitter(store)
    t.append(spark.createDataFrame([(1,)], "id long"))
    v = t.current_version()
    store.timeout_next_put = True
    t.append(spark.createDataFrame([(2,)], "id long"))
    assert t.current_version() == v + 1
    assert sorted(r.id for r in t.scan().collect()) == [1, 2]


def test_stale_pointer_walk_is_amortized_o1(spark, tmp_path, make_committer):
    """A pointer left far behind the head (crashed writer) costs ONE
    walk: the first read repairs the hint, so later cold reads are
    back to a constant number of existence probes."""
    root = str(tmp_path / "stale")
    t = LakeTable.create(spark, root)
    t.committer = make_committer()
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


def test_expire_with_stale_hint_resolves_true_head(
    spark, tmp_path, make_committer
):
    """ADVICE r9: expire_snapshots refreshes the pointer before
    deleting manifests, and even a hint regressed INTO the expired
    range afterwards (slow reader's late set_hint) falls back to a
    directory scan instead of resolving an expired head."""
    root = str(tmp_path / "exp")
    t = LakeTable.create(spark, root)
    t.committer = make_committer()
    for i in range(6):
        t.append(spark.createDataFrame([(i,)], "id long"))
    head = t.current_version()
    # stale hint from a crashed writer, THEN expire drops the old tail
    t.committer.set_hint(os.path.join(root, "_current"), "1")
    t.expire_snapshots(older_than_ms=None, keep_last=2)
    with open(os.path.join(root, "_current")) as f:
        assert int(f.read()) == head  # refreshed before deletion
    assert t.current_version() == head
