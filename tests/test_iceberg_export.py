"""Iceberg spec-v2 metadata mirror (lakehouse/iceberg_export.py):
the mapping must be LOSSLESS for snapshots, files, and schemas, and
deterministic against a golden fixture (r10 VERDICT #7)."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.iceberg_export import (
    export_iceberg_metadata,
    iceberg_schema,
    iceberg_schema_to_spark,
    metadata_dict,
)
from de_gcp_lakehouse_iceberg_spark.lakehouse.table import (
    FileEntry,
    Snapshot,
)

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "iceberg_v2_metadata.golden.json"
)


def test_schema_mapping_roundtrips_all_types():
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("price", T.DecimalType(12, 2), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("d", T.DateType(), True),
            T.StructField("flags", T.ArrayType(T.BooleanType(), False), True),
            T.StructField(
                "attrs", T.MapType(T.StringType(), T.DoubleType(), True), True
            ),
            T.StructField(
                "nested",
                T.StructType(
                    [
                        T.StructField("a", T.IntegerType(), True),
                        T.StructField("b", T.BinaryType(), False),
                    ]
                ),
                True,
            ),
        ]
    )
    ice = iceberg_schema(st.json())
    assert iceberg_schema_to_spark(ice) == st
    # field ids are unique and dense from 1 (assign-fresh-ids order)
    ids = []

    def walk(t):
        if isinstance(t, dict):
            for k in ("id", "element-id", "key-id", "value-id"):
                if k in t:
                    ids.append(t[k])
            for v in t.values():
                walk(v)
        elif isinstance(t, list):
            for v in t:
                walk(v)

    walk(ice)
    assert sorted(ids) == list(range(1, len(ids) + 1))


def _fixed_snapshots() -> list[Snapshot]:
    f1 = FileEntry(
        "data/part-0.parquet",
        rows=100,
        bytes=2048,
        partition={"event_date": "2024-01-01"},
        stats={"id": [1, 100], "v": [0.5, 9.5]},
        seq=1,
    )
    f2 = FileEntry(
        "data/part-1.parquet",
        rows=50,
        bytes=1024,
        partition={"event_date": "2024-01-02"},
        stats={"id": [101, 150]},
        seq=2,
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
            T.StructField("event_date", T.StringType(), True),
        ]
    ).json()
    return [
        Snapshot(1, 1700000000000, "append", [f1], schema, {"rows": 100}),
        Snapshot(
            2,
            1700000060000,
            "append",
            [f1, f2],
            schema,
            {"rows": 50},
            deletes=[{"predicate": "id = 7", "seq": 2}],
        ),
    ]


def test_metadata_dict_matches_golden_fixture():
    got = metadata_dict(
        _fixed_snapshots(),
        # canonical engine spec strings (transforms.parse_spec): the
        # export maps them via Transform, so names match the manifest
        # partition-dict keys (ts_day / id_bucket)
        ["days(ts)", "bucket(16,id)"],
        "/warehouse/events",
        "00000000-0000-0000-0000-00000000abcd",
    )
    with open(GOLDEN) as f:
        want = json.load(f)
    assert got == want


def test_export_is_lossless_for_snapshots_files_and_schemas(
    spark, tmp_path
):
    from de_gcp_lakehouse_iceberg_spark.lakehouse import dml

    t = LakeTable.create(spark, str(tmp_path / "ice"))
    t.append(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, v double"
        )
    )
    t.append(spark.createDataFrame([(3, "c", 3.5)], "id long, s string, v double"))
    dml.delete(t, "id = 1")
    mpath = export_iceberg_metadata(t)
    meta = json.load(open(mpath))

    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == t.current_version()
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    for v in range(t.current_version() + 1):
        snap = t.snapshot(v)
        exp = by_id[v]
        # snapshot metadata roundtrips
        assert exp["timestamp-ms"] == snap.timestamp_ms
        # schema roundtrips exactly
        schema = next(
            sc for sc in meta["schemas"]
            if sc["schema-id"] == exp["schema-id"]
        )
        if snap.schema_json:
            assert iceberg_schema_to_spark(schema) == T.StructType.fromJson(
                json.loads(snap.schema_json)
            )
        # file list roundtrips exactly (path, rows, bytes, seq)
        entries = json.load(
            open(
                os.path.join(
                    t.root, "iceberg", f"snap-{v}.manifest.json"
                )
            )
        )
        got_files = {
            (
                e["data_file"]["file_path"],
                e["data_file"]["record_count"],
                e["data_file"]["file_size_in_bytes"],
                e["sequence_number"],
            )
            for e in entries
        }
        want_files = {
            (os.path.join(t.root, f.path), f.rows, f.bytes, f.seq)
            for f in snap.files
        }
        assert got_files == want_files
        # manifest-list accounting is consistent
        (mf,) = json.load(
            open(
                os.path.join(
                    t.root, "iceberg", f"snap-{v}.manifest-list.json"
                )
            )
        )
        assert (
            mf["added_files_count"] + mf["existing_files_count"]
            == len(snap.files)
        )
        assert mf["manifest_length"] == os.path.getsize(
            os.path.join(t.root, "iceberg", f"snap-{v}.manifest.json")
        )


def test_unparseable_partition_transform_raises():
    """No silent identity fallback (r11 ADVICE): the once-accepted
    'bucket(col, N)' argument order must fail loudly, not export a
    wrong identity spec."""
    import pytest

    from de_gcp_lakehouse_iceberg_spark.lakehouse.iceberg_export import (
        _partition_fields,
    )

    with pytest.raises(ValueError, match="unparseable partition transform"):
        _partition_fields(["bucket(user_id, 8)"], 0)
    # canonical forms still parse
    fields = _partition_fields(
        ["days(ts)", "bucket(8, user_id)", "plain_col"], 0
    )
    assert [f["transform"] for f in fields] == ["day", "bucket[8]", "identity"]
    assert [f["field-id"] for f in fields] == [1000, 1001, 1002]


def test_manifest_metadata_carries_spec_required_keys(spark, tmp_path):
    """Manifest OCF key-value metadata must include the spec-required
    'partition-spec', 'partition-spec-id', 'schema', 'schema-id',
    'format-version', and 'content' keys (r11 ADVICE)."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse import avro, dml

    t = LakeTable.create(spark, str(tmp_path / "t"), partition_by=["s"])
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(10)],
            "id long, s string, v double",
        )
    )
    dml.delete_mor(t, "id = 3")
    export_iceberg_metadata(t, spark=spark)
    v = t.current_version()
    required = {
        "format-version", "content", "partition-spec",
        "partition-spec-id", "schema", "schema-id",
    }
    for name in (f"snap-{v}.manifest.avro", f"snap-{v}.deletes.manifest.avro"):
        _, meta, _ = avro.read_ocf(os.path.join(t.root, "iceberg", name))
        assert required <= set(meta), name
        spec_fields = json.loads(meta["partition-spec"])
        assert [f["name"] for f in spec_fields] == ["s"]
        assert meta["schema-id"].isdigit()
    assert meta["content"] == "deletes"


def test_position_delete_parquet_embeds_reserved_field_ids(spark, tmp_path):
    """The spec's reserved field-ids 2147483546/2147483545 must be real
    parquet field_id metadata on the delete files, not just a docstring
    claim (r11 ADVICE): a Java reader resolves columns by field-id."""
    import pyarrow.parquet as pq

    from de_gcp_lakehouse_iceberg_spark.lakehouse import avro, dml

    t = LakeTable.create(spark, str(tmp_path / "mor"))
    t.append(
        spark.createDataFrame(
            [(i, "x", float(i)) for i in range(12)],
            "id long, s string, v double",
        )
    )
    dml.delete_mor(t, "id % 3 = 0")
    export_iceberg_metadata(t, spark=spark)
    v = t.current_version()
    _, _, entries = avro.read_ocf(
        os.path.join(t.root, "iceberg", f"snap-{v}.deletes.manifest.avro")
    )
    assert entries, "no delete entries exported"
    sch = pq.ParquetFile(entries[0]["data_file"]["file_path"]).schema_arrow
    fid = lambda f: (f.metadata or {}).get(b"PARQUET:field_id")  # noqa: E731
    assert fid(sch.field("file_path")) == b"2147483546"
    assert fid(sch.field("pos")) == b"2147483545"


def test_partition_spec_fields_carry_source_id_from_schema():
    """r12 ADVICE: Iceberg's Java PartitionSpecParser REQUIRES
    source-id — a name-only spec would be rejected by a real reader.
    The exporter must resolve source-name -> the schema's field id at
    export time and emit spec-shaped fields."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse.iceberg_export import (
        _partition_fields,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    ).json()
    fields = _partition_fields(["days(ts)", "bucket(16,id)"], 0, schema)
    by_name = {f["name"]: f for f in fields}
    # fresh-ids assignment: id=1, ts=2, v=3
    assert by_name["ts_day"]["source-id"] == 2
    assert by_name["id_bucket"]["source-id"] == 1
    assert by_name["ts_day"]["transform"] == "day"
    assert by_name["id_bucket"]["field-id"] == 1001
    # spec-shaped: every key a Java parser reads is present
    assert {"name", "transform", "source-id", "field-id"} <= set(
        by_name["ts_day"]
    )
    # without a schema the spec stays name-documented only (no fake id)
    bare = _partition_fields(["days(ts)"], 0)
    assert "source-id" not in bare[0]
