"""tables.spread() — the r13 corpus scan fan-out guard (tables.py).

The corpus parquet fixtures carry almost no row groups, so without the
guard every regex/explode/signing stage ran on 1-7 of the executor
slots. These tests pin the guard's contract: fan-out happens exactly
when the scan underuses the cores, is a NO-OP otherwise (the 100 TB
posture — real multi-file layouts split naturally), never changes any
row, and the two plan-contract pipelines can opt out.
"""

from __future__ import annotations

from de_gcp_lakehouse_iceberg_spark.tables import spread, table


def test_spread_raises_narrow_scan_to_core_count(spark, sf_dir):
    docs_raw = table(spark, sf_dir, "documents", spread_corpus=False)
    cpus = spark.sparkContext.defaultParallelism
    assert docs_raw.rdd.getNumPartitions() < cpus  # fixture IS narrow
    docs = table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() == cpus


def test_spread_is_noop_when_already_split(spark, sf_dir):
    cpus = spark.sparkContext.defaultParallelism
    wide = table(spark, sf_dir, "documents").repartition(cpus + 5)
    out = spread(wide, "doc_id")
    assert out is wide  # identical object: no exchange added


def test_spread_preserves_rows_exactly(spark, sf_dir):
    raw = table(spark, sf_dir, "documents", spread_corpus=False)
    wide = table(spark, sf_dir, "documents")
    a = sorted(map(tuple, raw.collect()))
    b = sorted(map(tuple, wide.collect()))
    assert a == b
