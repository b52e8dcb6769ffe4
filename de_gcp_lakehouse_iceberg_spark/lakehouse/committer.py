"""The commit primitive behind the lakehouse's optimistic concurrency,
extracted so the POSIX implementation is one pluggable strategy rather
than the table format itself.

A LakeTable commit needs exactly two storage capabilities:

1. `cas_create(path, payload)` — atomically create `path` with
   `payload` IFF it does not already exist. This is the COMMIT POINT:
   two writers racing for the same version slot must see exactly one
   winner, and the loser must observe the collision (never overwrite).
2. `set_hint(path, value)` / `read_hint(path)` — an atomically
   replaceable pointer that is only ever a HINT: readers forward-walk
   from it to the real head (table.py `current_version`), so a stale
   or lost hint costs probes, never correctness.

The default `PosixLinkCommitter` implements cas_create with
write-temp + `os.link` (hard links fail with EEXIST atomically on
POSIX) and set_hint with `os.replace`.

Object-store portability (design note — the reference's tables live on
GCS, `sql/create_iceberg_tables.sql:27-28` storage_uri on gs://, where
hard links don't exist):

- **GCS**: conditional insert with `x-goog-if-generation-match: 0` —
  the PUT succeeds iff no live generation exists; a 412 is the
  CommitConflict signal. set_hint is a plain PUT (last-writer-wins is
  fine for a forward-walked hint).
- **S3 (2024+) / Azure / MinIO**: `If-None-Match: *` conditional PUT,
  same contract.
- **Catalog service** (Iceberg REST / Hive / DynamoDB-style): CAS on
  the (table, version) row; the manifest body can then live anywhere,
  because the catalog row is the commit point — this is also the route
  when the store offers no conditional PUT.

The conditional-PUT route is implemented here as
`ConditionalPutCommitter` over an `ObjectStore` protocol, with
`LocalObjectStore` as the in-process reference store: filesystem-
backed (Spark still reads the manifests via plain `open()`), GCS-style
per-object generation numbers, and injectable faults — including the
failure mode a hard-link CAS never has: a PUT that LANDS but whose
response is lost (timeout). The committer resolves that 412/timeout
ambiguity by reading the object back and claiming the win iff the body
is byte-identical to its own payload; manifest payloads are
writer-unique (commit timestamps + uuid'd data-file names), and for
the degenerate identical-payload race both writers wanting the same
bytes makes either claim harmless.

All routes drop in behind this interface without touching table.py:
the OCC semantics (rebase-and-retry, both-commits-survive, validated
copy-on-write rebase) depend only on the two methods' contracts —
test_committer.py runs the whole OCC fault-injection suite
parametrically over BOTH strategies.
"""

from __future__ import annotations

import abc
import os
import threading
import uuid


class PreconditionFailed(Exception):
    """Conditional PUT lost: a live generation already exists (HTTP
    412 on GCS/S3/Azure)."""


class AmbiguousTimeout(Exception):
    """The store never answered — the write may or may not have
    landed. The caller must resolve by reading back."""


class Committer(abc.ABC):
    """Storage-side atomic primitives for snapshot commits."""

    @abc.abstractmethod
    def cas_create(self, path: str, payload: str) -> bool:
        """Atomically create `path` containing `payload` iff it does
        not exist. True = this writer claimed the slot; False = another
        writer already has (the caller raises CommitConflict). Any
        other failure raises."""

    @abc.abstractmethod
    def set_hint(self, path: str, value: str) -> None:
        """Atomically replace the pointer hint at `path`. Best-effort
        ordering: a lost or stale hint is recovered by the reader's
        forward walk."""

    @abc.abstractmethod
    def read_hint(self, path: str) -> str | None:
        """Current hint value, or None if the hint does not exist."""


class PosixLinkCommitter(Committer):
    """POSIX filesystems: hard-link CAS + rename'd hint."""

    def cas_create(self, path: str, payload: str) -> bool:
        tmp = path + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        try:
            os.link(tmp, path)
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)
        return True

    def set_hint(self, path: str, value: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(value)
        os.replace(tmp, path)

    def read_hint(self, path: str) -> str | None:
        try:
            with open(path) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None


class LocalObjectStore:
    """In-process object store with GCS-style conditional-PUT
    semantics, backed by the local filesystem so every OTHER reader of
    the table (Spark scans, `current_version` walks) keeps working
    unchanged. One instance models one bucket; share it across writer
    handles the way racing jobs share a bucket.

    Generation numbers follow GCS: an object's generation starts at 1
    on create and increments on every overwrite; `put_if_absent`
    models `x-goog-if-generation-match: 0` (atomic via O_EXCL — the
    mock needs SOME local atomic create; what it adds over the POSIX
    committer is the API contract under test: 412 signaling,
    unconditional hint PUT, and lost-response windows).

    Fault injection: `timeout_next_put` makes the next conditional PUT
    LAND and then raise AmbiguousTimeout (response lost after the
    server applied it); `drop_next_put` makes it raise WITHOUT landing
    (request lost before the server). Both model real object-store
    timeout ambiguity that `os.link` can never produce."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._gen: dict[str, int] = {}
        self.timeout_next_put = False
        self.drop_next_put = False

    def put_if_absent(self, path: str, payload: str) -> int:
        """Create iff no live generation exists. Returns the new
        generation; raises PreconditionFailed on a live object,
        AmbiguousTimeout when the response is (injected) lost."""
        with self._lock:
            if self.drop_next_put:
                self.drop_next_put = False
                raise AmbiguousTimeout(path)
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise PreconditionFailed(path) from None
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            gen = self._gen[path] = self._gen.get(path, 0) + 1
            if self.timeout_next_put:
                self.timeout_next_put = False
                raise AmbiguousTimeout(path)
            return gen

    def put(self, path: str, payload: str) -> int:
        """Unconditional PUT (last writer wins) — the hint pointer."""
        with self._lock:
            tmp = path + f".{uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, path)
            gen = self._gen[path] = self._gen.get(path, 0) + 1
            return gen

    def get(self, path: str) -> str | None:
        try:
            with open(path) as f:
                return f.read()
        except FileNotFoundError:
            return None

    def generation(self, path: str) -> int:
        return self._gen.get(path, 1 if os.path.exists(path) else 0)


class ConditionalPutCommitter(Committer):
    """Object stores with conditional PUT (GCS
    `x-goog-if-generation-match: 0`; S3/Azure/MinIO `If-None-Match:
    *`): create-if-absent is the commit point, 412 the conflict
    signal — the deployment route for the reference's gs:// tables
    (sql/create_iceberg_tables.sql:27-28), where `os.link` does not
    exist.

    Timeout ambiguity (the contract hazard a link-CAS never has): a
    PUT can LAND and still raise. `cas_create` resolves 412-or-timeout
    by reading the object back — the slot is ours iff the body equals
    our payload byte-for-byte. Manifest payloads are writer-unique
    (commit timestamp + uuid'd file names); if two writers race
    byte-identical payloads, both claiming the win commits the exact
    state both wanted."""

    def __init__(self, store: LocalObjectStore) -> None:
        self.store = store

    def cas_create(self, path: str, payload: str) -> bool:
        try:
            self.store.put_if_absent(path, payload)
            return True
        except (PreconditionFailed, AmbiguousTimeout):
            # 412: the slot is live — possibly from OUR earlier
            # timed-out attempt. Timeout: our write may have landed.
            # Both resolve the same way: read back and compare.
            return self.store.get(path) == payload

    def set_hint(self, path: str, value: str) -> None:
        self.store.put(path, value)

    def read_hint(self, path: str) -> str | None:
        got = self.store.get(path)
        return got.strip() if got is not None else None
