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

All three drop in behind this interface without touching table.py:
the OCC semantics (rebase-and-retry, both-commits-survive, validated
copy-on-write rebase) depend only on the two methods' contracts.
"""

from __future__ import annotations

import abc
import os
import uuid


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
