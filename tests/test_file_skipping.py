"""Column-stats file skipping: footer min/max ride the manifest and
scan(where=...) provably drops files while returning identical rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable


def _mk(spark, tmp_path, batches):
    t = LakeTable.create(spark, str(tmp_path / "skiptbl"))
    for rows, schema in batches:
        t.append(spark.createDataFrame(rows, schema).coalesce(1))
    return t


def test_footer_stats_recorded(spark, tmp_path):
    t = _mk(
        spark,
        tmp_path,
        [([(1, 10.0, "a"), (5, 50.0, "b")], "id long, x double, s string")],
    )
    stats = t.snapshot().files[0].stats
    assert stats["id"] == [1, 5]
    assert stats["x"] == [10.0, 50.0]
    assert stats["s"] == ["a", "b"]


def test_scan_where_skips_files_and_matches_full_filter(spark, tmp_path):
    # three appends with disjoint id ranges -> three files with disjoint
    # [min,max]; a range predicate must plan only the matching file(s)
    schema = "id long, x double"
    t = _mk(
        spark,
        tmp_path,
        [
            ([(i, float(i)) for i in range(0, 10)], schema),
            ([(i, float(i)) for i in range(100, 110)], schema),
            ([(i, float(i)) for i in range(200, 210)], schema),
        ],
    )
    assert len(t.snapshot().files) == 3

    _, planned = t.plan_files(where=[("id", ">=", 200)])
    assert len(planned) == 1

    got = sorted(r.id for r in t.scan(where=[("id", ">=", 200)]).collect())
    want = sorted(
        r.id for r in t.scan().filter(F.col("id") >= 200).collect()
    )
    assert got == want == list(range(200, 210))

    # conjunction prunes to zero files yet still returns an empty,
    # well-formed result
    _, none = t.plan_files(where=[("id", ">", 50), ("id", "<", 90)])
    assert none == []
    assert t.scan(where=[("id", ">", 50), ("id", "<", 90)]).count() == 0


def test_timestamp_stats_prune(spark, tmp_path):
    schema = "id long, ts timestamp"
    day1 = [(i, dt.datetime(2024, 1, 1, i)) for i in range(5)]
    day2 = [(i, dt.datetime(2024, 2, 1, i)) for i in range(5)]
    t = _mk(spark, tmp_path, [(day1, schema), (day2, schema)])
    _, planned = t.plan_files(
        where=[("ts", ">=", dt.datetime(2024, 1, 15))]
    )
    assert len(planned) == 1
    assert t.scan(
        where=[("ts", ">=", dt.datetime(2024, 1, 15))]
    ).count() == 5


def test_pruning_never_drops_matching_rows_on_overlap(spark, tmp_path):
    # overlapping ranges: both files must stay
    schema = "id long"
    t = _mk(
        spark,
        tmp_path,
        [([(i,) for i in range(0, 60)], schema),
         ([(i,) for i in range(50, 120)], schema)],
    )
    _, planned = t.plan_files(where=[("id", "=", 55)])
    assert len(planned) == 2
    assert t.scan(where=[("id", "=", 55)]).count() == 2
