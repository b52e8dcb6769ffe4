"""Per-process-unique /tmp scratch roots for scenario queries.

Scenario queries (DML lifecycles, OCC races, index builds) create a
throwaway lakehouse under /tmp keyed by the sf_dir basename and rmtree
it at query start. With a FIXED path, two concurrent runs over the
same fixture — parallel pytest workers, overlapping bench drivers —
delete each other's live lakehouse mid-query, producing spurious
failures unrelated to the behavior under test (ADVICE r9,
occ_query/bm25). `scratch(tag)` suffixes the base with the pid, so
processes never share a root, while staying STABLE within a process
(repeat bench runs rebuild in place exactly as before). Every root is
registered for atexit removal, so dead-pid litter doesn't accumulate.
"""

from __future__ import annotations

import atexit
import os
import shutil

_REGISTERED: set[str] = set()


def scratch(tag: str) -> str:
    """`/tmp/<tag>_<pid>` — unique per process, stable within one."""
    root = f"/tmp/{tag}_{os.getpid()}"
    if root not in _REGISTERED:
        _REGISTERED.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root
