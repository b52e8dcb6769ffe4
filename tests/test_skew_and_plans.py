"""Skew-salted aggregation equivalence, physical-plan regression guards
(broadcast joins stay broadcast, filters stay pushed), and file-level
partition-pruned DML."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable, dml
from de_gcp_lakehouse_iceberg_spark.operators.skew import salted_agg
from de_gcp_lakehouse_iceberg_spark.plans import QUERIES


def test_salted_agg_equals_plain_agg(spark):
    # one hot key (80% of rows) + a long tail
    df = spark.range(10_000).select(
        F.when(F.col("id") % 5 != 0, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    got = {
        r.k: (r.cnt, r.total, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "cnt": (F.count("*"), F.sum("cnt")),
                "total": (F.sum("v"), F.sum("total")),
                "mx": (F.max("v"), F.max("mx")),
            },
        ).collect()
    }
    want = {
        r.k: (r.cnt, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want
    assert want[7][0] == 8000  # the hot key really is hot


def _plan(spark, name, sf_dir):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().toString()


def test_plan_q07_broadcasts_and_pushes(spark, sf_dir):
    plan = _plan(spark, "q07_star_join_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 2  # region+nation at minimum
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 2
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed  # parquet scans expose pushdown


def test_plan_q17_semijoin_broadcast(spark, sf_dir):
    plan = _plan(spark, "q17_semijoin_topk", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_plan_q12_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "q12_period_pct_change", sf_dir)
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("o_orderdate" in f for f in m), m


def test_partition_scoped_delete_rewrites_one_partition(spark, tmp_path):
    """D5 at scale: a partition-aligned DELETE must rewrite only files
    of the matching partition — everything else is metadata."""
    t = LakeTable.create(spark, str(tmp_path / "t"), partition_by=["day"])
    df = spark.range(300).select(
        F.col("id"),
        F.concat(F.lit("2025-01-0"), (F.col("id") % 3 + 1).cast("string"))
        .alias("day"),
    )
    t.append(df)
    before = {f.path: f.partition for f in t.snapshot().files}
    dml.delete(t, "day = '2025-01-02' AND id < 150")
    after_files = t.snapshot().files
    # unaffected partitions keep their exact original files
    untouched_before = {p for p, part in before.items() if part.get("day") != "2025-01-02"}
    untouched_after = {
        f.path for f in after_files if f.partition.get("day") != "2025-01-02"
    }
    assert untouched_before == untouched_after
    # and the data is right
    assert t.scan().filter("day = '2025-01-02'").count() == 100 - 50
    assert t.scan().count() == 250


def test_plan_q54_broadcasts_benchmark_shingles(spark, sf_dir):
    """Decontamination must stream the corpus past a BROADCAST benchmark
    set — a shuffle join here would move the whole corpus at 100 TB."""
    plan = _plan(spark, "q54_contamination", sf_dir)
    assert "BroadcastHashJoin" in plan


def test_plan_q56_asof_single_shuffle(spark, sf_dir):
    """The as-of join is one union + one window: exactly one Exchange
    on the key (plus the final-agg exchanges), never a join explosion."""
    plan = QUERIES["q56_asof_error_context"](spark, sf_dir)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in s and "BroadcastNestedLoopJoin" not in s
    # the carry-forward is a window over (user_id), not a self-join
    assert "Window" in s


def test_plan_q58_kmeans_broadcasts_centroids(spark, sf_dir):
    plan = _plan(spark, "q58_kmeans", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_plan_q70_semdedup_broadcasts_centroids(spark, sf_dir):
    """SemDeDup's assignment stage must broadcast the k seed centroids
    (no corpus-sized shuffle before the pair stage)."""
    from de_gcp_lakehouse_iceberg_spark.plans import QUERIES

    plan = (
        QUERIES["q70_semdedup"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan


def test_plan_q79_split_is_scan_time(spark, sf_dir):
    """Split assignment is a row-local expression: the labeling itself
    adds NO exchange (only the census aggregation shuffles)."""
    from de_gcp_lakehouse_iceberg_spark.operators.sampling import (
        split_assign,
    )
    from de_gcp_lakehouse_iceberg_spark.tables import table

    df = split_assign(table(spark, sf_dir, "documents", spread_corpus=False))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_plan_q76_resample_two_windows_one_agg(spark, sf_dir):
    """Resample: hourly agg shuffle + the (g) window partitioning —
    no unbounded extra exchanges from the grid join."""
    from de_gcp_lakehouse_iceberg_spark.plans import QUERIES

    plan = (
        QUERIES["q76_resample_gapfill"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 5


def test_plan_kmv_two_phase_no_window_sort(spark):
    """kmv_sketch must be the two-phase min-k: partial set aggregation
    BEFORE every exchange and NO per-group window/sort (the old form
    pushed every distinct hash of a group through one sort task)."""
    from pyspark.sql import functions as F

    from de_gcp_lakehouse_iceberg_spark.operators.sketches import (
        kmv_sketch,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    plan = (
        kmv_sketch(df, ["g"], "v", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_collect_set" in plan       # map-side combine
    assert "Window" not in plan and "Sort " not in plan
