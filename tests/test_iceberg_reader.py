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


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_existing_entry_with_null_sequence_number_raises(
    spark, tmp_path, monkeypatch
):
    """Spec: sequence-number inheritance applies only to ADDED entries;
    an EXISTING entry with a null sequence_number is corrupt metadata
    and must fail loudly, not silently inherit the manifest's seq and
    mis-scope delete application (r11 ADVICE)."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse import avro as _avro
    from de_gcp_lakehouse_iceberg_spark.lakehouse import iceberg_reader

    t = _build(spark, str(tmp_path / "t"))
    mpath = export_iceberg_metadata(t)

    real_read_ocf = _avro.read_ocf

    def nulled(path):
        schema, meta, entries = real_read_ocf(path)
        for e in entries:
            if "data_file" in e and e.get("status") == 0:  # EXISTING
                e["sequence_number"] = None
        return schema, meta, entries

    monkeypatch.setattr(iceberg_reader.avro, "read_ocf", nulled)
    with pytest.raises(ValueError, match="EXISTING manifest entry"):
        read_iceberg(spark, mpath)


def test_delete_broadcast_is_size_gated(spark, tmp_path, monkeypatch):
    """The position-delete set scales with deleted ROWS; above
    BROADCAST_DELETE_ROWS the anti-join must run unhinted (no
    broadcast of the delete relation) while results stay identical
    (r11 ADVICE, medium)."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse import iceberg_reader

    t = LakeTable.create(spark, str(tmp_path / "mor"))
    t.append(
        spark.createDataFrame(
            [(i, "x", float(i)) for i in range(40)],
            "id long, s string, v double",
        )
    )
    dml.delete_mor(t, "id % 2 = 0")
    mpath = export_iceberg_metadata(t, spark=spark)

    small = read_iceberg(spark, mpath)  # 20 deletes <= threshold
    assert "BroadcastHashJoin" in _plan(small)

    # An unhinted tiny relation still auto-broadcasts (Spark's choice
    # — exactly what "let Spark pick" means), so to PROVE the hint is
    # gone above the threshold, turn auto-broadcast off: the hinted
    # small path must still broadcast, the size-gated path must not.
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        hinted = read_iceberg(spark, mpath)
        assert "BroadcastHashJoin" in _plan(hinted)
        monkeypatch.setattr(iceberg_reader, "BROADCAST_DELETE_ROWS", 5)
        large = read_iceberg(spark, mpath)
        anti_lines = [
            ln for ln in _plan(large).splitlines() if "LeftAnti" in ln
        ]
        assert anti_lines and all(
            "BroadcastHashJoin" not in ln for ln in anti_lines
        ), anti_lines
        rows_large = _rows(large)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert rows_large == _rows(small) == _rows(t.scan())
