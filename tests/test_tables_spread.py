"""tables.spread() — the r13 corpus scan fan-out guard (tables.py).

The corpus parquet fixtures carry almost no row groups, so without the
guard every regex/explode/signing stage ran on 1-7 of the executor
slots. These tests pin the guard's contract: fan-out happens exactly
when the scan underuses the cores, is a NO-OP otherwise (the 100 TB
posture — real multi-file layouts split naturally), never changes any
row, and the two plan-contract pipelines can opt out. r14: the decision
is measurement-driven (footer row-group ceiling, memoized), never
name-keyed — a narrow-file RELATIONAL fixture gets the guard too when
the caller declares a heavy projection.
"""

from __future__ import annotations

import os

import pytest

from de_gcp_lakehouse_iceberg_spark.tables import (
    _measured_splits,
    _SPLITS,
    spread,
    table,
)


def test_spread_raises_narrow_scan_to_core_count(spark, sf_dir):
    docs_raw = table(spark, sf_dir, "documents", spread_corpus=False)
    cpus = spark.sparkContext.defaultParallelism
    if docs_raw.rdd.getNumPartitions() >= cpus:
        # on a low-core host the fixture's natural splits can already
        # reach the core count; the guard is then a no-op by contract
        # and the fan-out assertion below has no narrow scan to test
        pytest.skip("fixture already splits to the core count")
    docs = table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() == cpus


def test_spread_is_noop_when_already_split(spark, sf_dir):
    cpus = spark.sparkContext.defaultParallelism
    wide = table(spark, sf_dir, "documents").repartition(cpus + 5)
    out = spread(wide, "doc_id")
    assert out is wide  # identical object: no exchange added


def test_spread_honours_caller_measured_count(spark, sf_dir):
    cpus = spark.sparkContext.defaultParallelism
    narrow = table(spark, sf_dir, "documents", spread_corpus=False)
    # caller-supplied measurement decides — no df.rdd planning happens
    out = spread(narrow, "doc_id", measured=cpus + 1)
    assert out is narrow
    out2 = spread(narrow, "doc_id", measured=1)
    assert out2 is not narrow
    assert out2.rdd.getNumPartitions() == cpus


def test_spread_preserves_rows_exactly(spark, sf_dir):
    raw = table(spark, sf_dir, "documents", spread_corpus=False)
    wide = table(spark, sf_dir, "documents")
    a = sorted(map(tuple, raw.collect()))
    b = sorted(map(tuple, wide.collect()))
    assert a == b


def test_heavy_hint_spreads_a_narrow_relational_fixture(spark, tmp_path):
    """The r13 row-group starvation was a property of ANY narrow-file
    fixture, not of the corpus tables — a 1-row-group `nation` file
    under a heavy-projection declaration must get the same fan-out."""
    cpus = spark.sparkContext.defaultParallelism
    if cpus < 2:
        pytest.skip("single-core session cannot demonstrate fan-out")
    sfd = str(tmp_path)
    spark.createDataFrame(
        [(i, f"N{i}", i % 5, "x") for i in range(200)],
        "n_nationkey int, n_name string, n_regionkey int, n_comment string",
    ).coalesce(1).write.parquet(os.path.join(sfd, "_n"))
    # single-file layout like the real fixtures: one parquet file at
    # {sf_dir}/nation.parquet with exactly one row group
    part = [
        f for f in os.listdir(os.path.join(sfd, "_n"))
        if f.endswith(".parquet")
    ][0]
    os.rename(os.path.join(sfd, "_n", part), os.path.join(sfd, "nation.parquet"))

    assert _measured_splits(spark, sfd, "nation") == 1
    # default: relational table, no heavy work declared -> no exchange
    assert table(spark, sfd, "nation").rdd.getNumPartitions() == 1
    # declared heavy projection -> measured 1 < cpus -> fan-out
    heavy = table(spark, sfd, "nation", heavy=True)
    assert heavy.rdd.getNumPartitions() == cpus
    # and heavy=False overrides the corpus default off (q81's
    # doc_id-only route)
    spark.createDataFrame([(1, "a", "s")], "doc_id long, text string, source string") \
        .coalesce(1).write.mode("overwrite").parquet(os.path.join(sfd, "_d"))
    part = [
        f for f in os.listdir(os.path.join(sfd, "_d"))
        if f.endswith(".parquet")
    ][0]
    os.rename(os.path.join(sfd, "_d", part), os.path.join(sfd, "documents.parquet"))
    assert table(spark, sfd, "documents", heavy=False).rdd.getNumPartitions() == 1


def test_measured_splits_memoized_per_fixture(spark, sf_dir):
    n = _measured_splits(spark, sf_dir, "documents")
    key = (os.path.normpath(sf_dir), "documents")
    assert _SPLITS[key] == n
    # poison the cache: a second call must NOT re-measure
    _SPLITS[key] = 9999
    try:
        assert _measured_splits(spark, sf_dir, "documents") == 9999
    finally:
        _SPLITS[key] = n
