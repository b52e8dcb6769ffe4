"""The consumer half of the Iceberg binary mirror:
`lakehouse/iceberg_reader.py` reconstructs a table from its SPEC
files alone (metadata JSON → Avro manifest list → Avro manifests →
parquet + position deletes), never touching the engine's own
manifests — so `export → read_iceberg == scan()` is an independent
round-trip through the public format, including time travel and
merge-on-read deletes, under both the null and deflate Avro codecs.
"""

from __future__ import annotations

import os

import pytest

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml
from de_gcp_lakehouse_iceberg_spark.lakehouse.iceberg_export import (
    export_iceberg_metadata,
)
from de_gcp_lakehouse_iceberg_spark.lakehouse.iceberg_reader import (
    read_iceberg,
    snapshot_ids,
)


def _rows(df, cols=("id", "s", "v")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _build(spark, root) -> LakeTable:
    t = LakeTable.create(spark, root, partition_by=["s"])
    t.append(
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(30)],
            "id long, s string, v double",
        )
    )
    t.append(
        spark.createDataFrame(
            [(i, "c", float(i)) for i in range(30, 40)],
            "id long, s string, v double",
        )
    )
    dml.delete(t, "id % 4 = 1")  # copy-on-write rewrite
    dml.update(t, {"v": "v * 2"}, "id >= 35")
    return t


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_read_iceberg_roundtrips_head(spark, tmp_path, codec):
    t = _build(spark, str(tmp_path / "t"))
    mpath = export_iceberg_metadata(t, codec=codec)
    got = read_iceberg(spark, mpath)
    assert [f.name for f in got.schema.fields] == ["id", "s", "v"]
    assert _rows(got) == _rows(t.scan())


def test_read_iceberg_time_travel_every_snapshot(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"))
    mpath = export_iceberg_metadata(t)
    ids = snapshot_ids(mpath)
    assert ids == list(range(t.current_version() + 1))
    for v in ids:
        got = read_iceberg(spark, mpath, snapshot_id=v)
        if v == 0:  # empty create snapshot (no schema recorded yet)
            assert got.count() == 0
            continue
        assert _rows(got) == _rows(t.scan(version=v))


def test_read_iceberg_accepts_table_directory(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    got = read_iceberg(spark, t.root)
    assert _rows(got) == _rows(t.scan())


def test_read_iceberg_applies_position_deletes(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "mor"))
    t.append(
        spark.createDataFrame(
            [(i, "x", float(i)) for i in range(25)],
            "id long, s string, v double",
        )
    )
    dml.delete_mor(t, "id % 3 = 0")
    dml.delete_mor(t, "v > 20.0")
    # rows appended after the deletes must survive even where the
    # predicates match (sequence-number ordering)
    t.append(
        spark.createDataFrame(
            [(3, "late", 24.0)], "id long, s string, v double"
        )
    )
    mpath = export_iceberg_metadata(t, spark=spark)
    got = read_iceberg(spark, mpath)
    assert _rows(got) == _rows(t.scan())
    assert (3, "late", 24.0) in _rows(got)


def test_read_iceberg_rejects_unknown_snapshot(spark, tmp_path):
    t = _build(spark, str(tmp_path / "t"))
    mpath = export_iceberg_metadata(t)
    with pytest.raises(ValueError, match="not in metadata"):
        read_iceberg(spark, mpath, snapshot_id=999)
