"""Table cloning — the BigQuery `CREATE SNAPSHOT TABLE` / table-clone
surface (and Iceberg's snapshot-registration), re-expressed for the
parquet+manifest lakehouse: materialize ONE logical snapshot of a
table as a brand-new independent table.

Files untouched by pending merge-on-read deletes are copied VERBATIM
with their manifest entries — column stats, bloom bitsets, partition
values and per-file spec carry over, so file skipping works
identically on the clone. Files a pending MOR delete applies to are
MATERIALIZED through the delete filter instead (their logical rows
are what the snapshot contains; copying the raw file plus the delete
entry would be wrong on the clone, whose fresh commit sequence would
let a FUTURE delete entry out-order the inherited ones). The clone
therefore starts with zero pending deletes, sequence numbers reset,
and a fresh history — later DML on either table never affects the
other (the restore/backup contract). History, tags, and staged WAP
commits do not transfer.

Cost: O(live data bytes) file copy + one metadata commit; only
delete-affected files pay a read-rewrite. A 100 TB deployment points
the verbatim copies at object-store server-side copy; the metadata
shape is identical.
"""

from __future__ import annotations

import os
import shutil

from .table import FileEntry, LakeTable, Snapshot


def clone_table(
    src: LakeTable,
    dst_root: str,
    version: int | None = None,
    tag: str | None = None,
    as_of_ms: int | None = None,
) -> LakeTable:
    """Clone one snapshot of `src` (current by default; or a version /
    tag / timestamp) into a new table at `dst_root`."""
    if tag is not None:
        snap = src.snapshot(src.resolve_tag(tag))
    elif as_of_ms is not None:
        snap = src.snapshot_as_of(as_of_ms)
    else:
        snap = src.snapshot(version)
    dst = LakeTable.create(
        src.spark, dst_root, partition_by=list(src.partition_by)
    )
    verbatim = [
        f
        for f in snap.files
        if not any(f.seq < d["seq"] for d in snap.deletes)
    ]
    verbatim_paths = {f.path for f in verbatim}
    affected = [f for f in snap.files if f.path not in verbatim_paths]

    entries: list[FileEntry] = []
    for f in verbatim:
        src_path = os.path.join(src.root, f.path)
        dst_path = os.path.join(dst.root, f.path)
        os.makedirs(os.path.dirname(dst_path), exist_ok=True)
        shutil.copy2(src_path, dst_path)
        e = FileEntry.from_json(f.to_json())  # stats/blooms/spec kept
        e.seq = 1  # the clone commit; fresh sequence space
        entries.append(e)
    if affected:
        sub = Snapshot(
            version=snap.version,
            timestamp_ms=snap.timestamp_ms,
            operation="clone_read",
            files=affected,
            schema_json=snap.schema_json,
            deletes=snap.deletes,  # _read_files applies them
        )
        df = src._read_files(sub, [f.path for f in affected])
        rewritten = dst._write_files(df)
        for e in rewritten:
            e.seq = 1
        entries += rewritten

    dst._commit_snapshot(
        operation="clone",
        files=entries,
        schema_json=snap.schema_json,
        base=dst.current_version(),
        summary={
            "cloned_from": src.root,
            "cloned_version": snap.version,
            "verbatim_files": len(verbatim),
            "materialized_files": len(affected),
        },
        deletes=[],
    )
    return dst
