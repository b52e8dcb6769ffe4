"""Iceberg binary-format compatibility (round-11 continuation of
r10 VERDICT #7 / "What's missing" #1):

- `lakehouse/avro.py` is a from-the-public-spec Avro binary codec —
  prove the OCF writer round-trips through the INDEPENDENT decoder
  across every type the manifests use (and a few they don't).
- Manifest/manifest-list `.avro` files carry the spec's records with
  Appendix-C field-ids and Appendix-D id-keyed BINARY bounds — prove
  they decode back to exactly the engine's manifest state.
- Predicate merge-on-read deletes materialize as spec POSITION
  delete files — prove that applying (file_path, pos) anti-joins to
  the raw data files reproduces the engine's MOR scan row-for-row.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, avro, dml
from de_gcp_lakehouse_iceberg_spark.lakehouse.iceberg_export import (
    export_iceberg_metadata,
    iceberg_schema,
    schema_field_index,
    single_value_bytes,
    single_value_decode,
)

# ---------------------------------------------------------------------------
# Avro codec
# ---------------------------------------------------------------------------

MIXED_SCHEMA = {
    "type": "record",
    "name": "top",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "arr", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {
            "name": "fx",
            "type": {"type": "fixed", "name": "f16", "size": 4},
        },
        {
            "name": "en",
            "type": {
                "type": "enum",
                "name": "color",
                "symbols": ["RED", "GREEN", "BLUE"],
            },
        },
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "kv",
                "fields": [
                    {"name": "key", "type": "int"},
                    {"name": "value", "type": "bytes"},
                ],
            },
        },
        # named-type reference: reuse `kv` by name in an array
        {
            "name": "pairs",
            "type": {"type": "array", "items": "kv"},
        },
    ],
}


def _mixed_records():
    return [
        {
            "b": True,
            "i": -1,
            "l": 2**40,
            "f": 1.5,
            "d": -2.25,
            "s": "héllo",
            "by": b"\x00\xff",
            "opt": None,
            "arr": ["a", "b", ""],
            "m": {"x": 1, "y": -2},
            "fx": b"\x01\x02\x03\x04",
            "en": "GREEN",
            "nested": {"key": 7, "value": b"v"},
            "pairs": [{"key": 1, "value": b"a"}, {"key": 2, "value": b"b"}],
        },
        {
            "b": False,
            "i": 2**30,
            "l": -(2**62),
            "f": 0.0,
            "d": 1e300,
            "s": "",
            "by": b"",
            "opt": 42,
            "arr": [],
            "m": {},
            "fx": b"\xff\xff\xff\xff",
            "en": "RED",
            "nested": {"key": -7, "value": b""},
            "pairs": [],
        },
    ]


def test_avro_ocf_roundtrips_mixed_schema(tmp_path):
    path = str(tmp_path / "mixed.avro")
    n = avro.write_ocf(path, MIXED_SCHEMA, _mixed_records())
    assert n == os.path.getsize(path)
    schema, meta, records = avro.read_ocf(path)
    assert schema == MIXED_SCHEMA
    assert meta["avro.codec"] == "null"
    want = _mixed_records()
    # floats go through IEEE-754 single precision
    for got, exp in zip(records, want):
        assert got.keys() == exp.keys()
        for k in exp:
            if k == "f":
                assert abs(got[k] - exp[k]) < 1e-6
            else:
                assert got[k] == exp[k], k
    assert len(records) == len(want)


def test_avro_ocf_bytes_are_deterministic(tmp_path):
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    avro.write_ocf(p1, MIXED_SCHEMA, _mixed_records())
    avro.write_ocf(p2, MIXED_SCHEMA, _mixed_records())
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_avro_multi_block_streaming(tmp_path):
    """Bounded blocks: a generator of records streams through
    block_bytes-sized flushes (writer memory O(block), not O(file))
    and the reader walks every block."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    path = str(tmp_path / "blocks.avro")
    avro.write_ocf(
        path,
        schema,
        ({"i": i, "s": f"row-{i}"} for i in range(5000)),
        block_bytes=4096,
    )
    _, _, records = avro.read_ocf(path)
    assert [r["i"] for r in records] == list(range(5000))
    # more than one block actually got written
    raw = open(path, "rb").read()
    import hashlib as _h
    import json as _json

    sync = _h.md5(
        _json.dumps(schema, sort_keys=True, separators=(",", ":")).encode()
    ).digest()
    assert raw.count(sync) > 3  # header + >2 block terminators


def test_avro_zigzag_longs_exhaustive_edges(tmp_path):
    schema = {
        "type": "record",
        "name": "l",
        "fields": [{"name": "v", "type": "long"}],
    }
    edges = [0, -1, 1, 63, 64, -64, -65, 2**31 - 1, -(2**31),
             2**63 - 1, -(2**63)]
    path = str(tmp_path / "l.avro")
    avro.write_ocf(path, schema, [{"v": v} for v in edges])
    _, _, records = avro.read_ocf(path)
    assert [r["v"] for r in records] == edges


# ---------------------------------------------------------------------------
# Appendix-D single-value serialization
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "t,v",
    [
        ("int", -7),
        ("long", 2**40),
        ("date", 19723),
        ("timestamptz", 1700000000000000),
        ("float", 1.5),
        ("double", -3.25),
        ("string", "naïve"),
        ("boolean", True),
        ("decimal(12, 2)", -12345),
    ],
)
def test_single_value_roundtrip(t, v):
    b = single_value_bytes(t, v)
    assert isinstance(b, bytes)
    assert single_value_decode(t, b) == v


def test_single_value_widths_match_spec():
    # Appendix D: int/date 4 bytes LE, long/timestamp 8 bytes LE
    assert single_value_bytes("int", 1) == b"\x01\x00\x00\x00"
    assert single_value_bytes("long", 1) == b"\x01" + b"\x00" * 7
    assert single_value_bytes("string", "ab") == b"ab"
    # decimal: minimal two's-complement big-endian unscaled value
    assert single_value_bytes("decimal(9, 2)", 255) == b"\x00\xff"
    assert single_value_bytes("decimal(9, 2)", -1) == b"\xff"
    # exact negative powers of two fit the sign bit for free — the
    # minimum-bytes rule (r11 ADVICE: was emitting b"\xff\x80")
    assert single_value_bytes("decimal(9, 2)", -128) == b"\x80"
    assert single_value_bytes("decimal(9, 2)", -129) == b"\xff\x7f"
    assert single_value_bytes("decimal(9, 2)", 128) == b"\x00\x80"
    assert single_value_bytes("decimal(9, 2)", 0) == b"\x00"
    for v in range(-1050, 1050):
        b = single_value_bytes("decimal(9, 2)", v)
        assert single_value_decode("decimal(9, 2)", b) == v
        # re-encoding the decoded minimal bytes is a fixpoint
        assert len(b) == (8 + (v + (v < 0)).bit_length()) // 8


# ---------------------------------------------------------------------------
# manifest / manifest-list Avro against a live table
# ---------------------------------------------------------------------------


def _build_table(spark, root) -> LakeTable:
    t = LakeTable.create(spark, root, partition_by=["p"])
    t.append(
        spark.createDataFrame(
            [(1, "a", 1.5, "x"), (2, "b", 2.5, "x"), (3, "c", 3.5, "y")],
            "id long, s string, v double, p string",
        )
    )
    t.append(
        spark.createDataFrame(
            [(4, "d", 4.5, "y")], "id long, s string, v double, p string"
        )
    )
    return t


def test_manifest_avro_matches_engine_state(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "ice"))
    export_iceberg_metadata(t)
    head = t.current_version()
    snap = t.snapshot(head)
    fidx = schema_field_index(snap.schema_json)

    apath = os.path.join(t.root, "iceberg", f"snap-{head}.manifest.avro")
    schema, meta, entries = avro.read_ocf(apath)
    assert meta["format-version"] == "2"
    assert meta["content"] == "data"
    # the embedded iceberg schema matches the export's own mapping
    assert json.loads(meta["schema"]) == iceberg_schema(snap.schema_json)

    by_path = {e["data_file"]["file_path"]: e for e in entries}
    assert set(by_path) == {
        os.path.join(t.root, f.path) for f in snap.files
    }
    for f in snap.files:
        e = by_path[os.path.join(t.root, f.path)]
        assert e["sequence_number"] == f.seq
        assert e["status"] == (1 if f.seq == head else 0)
        df = e["data_file"]
        assert df["record_count"] == f.rows
        assert df["file_size_in_bytes"] == f.bytes
        assert df["partition"] == {
            k: v for k, v in f.partition.items()
        }
        # footer-harvested count maps match the file's true footer
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(os.path.join(t.root, f.path)).metadata
        values = {x["key"]: x["value"] for x in df["value_counts"]}
        assert set(values.values()) == {pf.num_rows}
        assert set(values) == {fid for fid, _ in fidx.values()}
        nulls = {x["key"]: x["value"] for x in df["null_value_counts"]}
        assert all(v == 0 for v in nulls.values())
        sizes = {x["key"]: x["value"] for x in df["column_sizes"]}
        assert all(v > 0 for v in sizes.values())
        # split_offsets: one ascending offset per row group, all
        # inside the file
        offs = df["split_offsets"]
        assert offs == sorted(offs)
        assert len(offs) == pf.num_row_groups
        assert all(0 <= o < f.bytes for o in offs)
        # id-keyed binary bounds decode back to the engine's stats
        lower = {x["key"]: x["value"] for x in df["lower_bounds"] or []}
        upper = {x["key"]: x["value"] for x in df["upper_bounds"] or []}
        for col, mm in f.stats.items():
            fid, ice_t = fidx[col]
            want_lo = single_value_bytes(ice_t, mm[0])
            if want_lo is None:
                continue
            assert single_value_decode(ice_t, lower[fid]) == mm[0]
            assert single_value_decode(ice_t, upper[fid]) == mm[1]

    # field-ids present on every manifest_entry schema field
    assert all("field-id" in f for f in schema["fields"])


def test_manifest_list_avro_accounting(spark, tmp_path):
    t = _build_table(spark, str(tmp_path / "ice"))
    export_iceberg_metadata(t)
    head = t.current_version()
    snap = t.snapshot(head)
    lpath = os.path.join(
        t.root, "iceberg", f"snap-{head}.manifest-list.avro"
    )
    _, _, records = avro.read_ocf(lpath)
    (mf,) = records
    assert mf["content"] == 0
    assert mf["added_files_count"] + mf["existing_files_count"] == len(
        snap.files
    )
    assert (
        mf["added_rows_count"] + mf["existing_rows_count"]
        == snap.total_rows
    )
    apath = os.path.join(t.root, "iceberg", f"snap-{head}.manifest.avro")
    assert mf["manifest_path"] == apath
    assert mf["manifest_length"] == os.path.getsize(apath)
    # partition field summaries cover the partition column's range
    (summary,) = mf["partitions"]
    assert summary["contains_null"] is False
    assert summary["lower_bound"] == b"x"
    assert summary["upper_bound"] == b"y"
    # metadata json points at the avro manifest list
    meta = json.load(
        open(os.path.join(t.root, "iceberg", f"v{head}.metadata.json"))
    )
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == head
    )
    assert cur["manifest-list"] == lpath


def test_multifield_partition_ids_agree_with_spec(spark, tmp_path):
    """r102 partition field-ids must follow the table's DECLARATION
    order (matching the metadata partition-spec's 1000+i ids), not a
    sorted order — a reader resolving manifest partition values by
    field-id would otherwise swap the fields."""
    t = LakeTable.create(
        spark, str(tmp_path / "mp"), partition_by=["src", "cat"]
    )
    t.append(
        spark.createDataFrame(
            [(1, "b_src", "a_cat"), (2, "a_src", "b_cat")],
            "id long, src string, cat string",
        )
    )
    export_iceberg_metadata(t)
    head = t.current_version()
    meta = json.load(
        open(os.path.join(t.root, "iceberg", f"v{head}.metadata.json"))
    )
    (spec,) = meta["partition-specs"]
    spec_ids = {f["name"]: f["field-id"] for f in spec["fields"]}
    assert spec_ids == {"src": 1000, "cat": 1001}
    schema, _, entries = avro.read_ocf(
        os.path.join(t.root, "iceberg", f"snap-{head}.manifest.avro")
    )
    r102 = next(
        f["type"] for f in schema["fields"][-1]["type"]["fields"]
        if f["name"] == "partition"
    )
    manifest_ids = {f["name"]: f["field-id"] for f in r102["fields"]}
    assert manifest_ids == spec_ids
    # values land under the right names
    for e in entries:
        p = e["data_file"]["partition"]
        assert set(p) == {"src", "cat"}
        assert p["src"].endswith("_src") and p["cat"].endswith("_cat")


# ---------------------------------------------------------------------------
# position-delete materialization
# ---------------------------------------------------------------------------


def test_position_deletes_reproduce_mor_scan(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "mor"))
    t.append(
        spark.createDataFrame(
            [(i, f"d{i}", float(i)) for i in range(20)],
            "id long, s string, v double",
        )
    )
    t.append(
        spark.createDataFrame(
            [(i, f"d{i}", float(i)) for i in range(20, 30)],
            "id long, s string, v double",
        )
    )
    dml.delete_mor(t, "id % 3 = 0")
    dml.delete_mor(t, "v > 25.0")
    # a file appended AFTER the deletes: its rows must survive even
    # where the predicates match (seq ordering), and must not appear
    # in any position-delete file
    t.append(
        spark.createDataFrame(
            [(3, "resurrected", 27.0)], "id long, s string, v double"
        )
    )
    export_iceberg_metadata(t, spark=spark)

    head = t.current_version()
    snap = t.snapshot(head)
    lpath = os.path.join(
        t.root, "iceberg", f"snap-{head}.manifest-list.avro"
    )
    _, _, records = avro.read_ocf(lpath)
    dels = [r for r in records if r["content"] == 1]
    assert len(dels) == 1
    _, dmeta, dentries = avro.read_ocf(dels[0]["manifest_path"])
    assert dmeta["content"] == "deletes"
    assert len(dentries) == 2  # one per predicate delete entry
    for e in dentries:
        assert e["data_file"]["content"] == 1
        assert os.path.getsize(e["data_file"]["file_path"]) == (
            e["data_file"]["file_size_in_bytes"]
        )

    # applying the position deletes Iceberg-style reproduces the
    # engine's MOR scan: for each data file, drop listed positions
    # from delete files whose seq > the file's seq
    expected = {
        tuple(r) for r in t.scan().select("id", "s", "v").collect()
    }
    survivors = set()
    for f in snap.files:
        path = os.path.join(t.root, f.path)
        rows = (
            spark.read.parquet(path)
            .select(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("_metadata.file_path"), "^file:", ""
                    ),
                    "^/+",
                    "/",
                ).alias("fp"),
                F.col("_metadata.row_index").alias("pos"),
                "id",
                "s",
                "v",
            )
            .collect()
        )
        dead = set()
        for e in dentries:
            if e["sequence_number"] <= f.seq:
                continue
            dfile = e["data_file"]["file_path"]
            for dr in spark.read.parquet(dfile).collect():
                dead.add((dr.file_path, dr.pos))
        for r in rows:
            if (r.fp, r.pos) not in dead:
                survivors.add((r.id, r.s, r.v))
    assert survivors == expected
    # the resurrected row is live and never listed as deleted
    assert (3, "resurrected", 27.0) in survivors


def test_delete_files_sorted_and_schema(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "mor2"))
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "id long, v double"
        ).repartition(4)
    )
    dml.delete_mor(t, "id % 7 = 0")
    export_iceberg_metadata(t, spark=spark)
    head = t.current_version()
    (dfile,) = glob.glob(
        os.path.join(
            t.root, "iceberg", f"snap-{head}-delete-0.parquet.d",
            "part-*.parquet",
        )
    )
    rows = spark.read.parquet(dfile).collect()
    assert [r.asDict() for r in rows] == sorted(
        (r.asDict() for r in rows),
        key=lambda d: (d["file_path"], d["pos"]),
    )
    got = spark.read.parquet(dfile)
    assert [f.name for f in got.schema.fields] == ["file_path", "pos"]
    assert {f.dataType.simpleString() for f in got.schema.fields} == {
        "string",
        "bigint",
    }
