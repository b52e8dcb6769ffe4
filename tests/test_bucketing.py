"""Bucketed co-located joins: same-bucketed tables join without any
shuffle Exchange, and results match the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        left = spark.range(10_000).select(
            (F.col("id") % 500).alias("k"), F.col("id").alias("a")
        )
        right = spark.range(5_000).select(
            (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("b")
        )
        write_bucketed(left, "bkt_left", ["k"], num_buckets=8, sort_keys=["k"])
        write_bucketed(right, "bkt_right", ["k"], num_buckets=8, sort_keys=["k"])

        joined = bucketed_join(spark, "bkt_left", "bkt_right", on=["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: shuffle eliminated

        # results equal the plain (shuffling) join
        got = joined.agg(
            F.count("*").alias("n"), F.sum(F.col("a") + F.col("b")).alias("s")
        ).collect()[0]
        want = (
            left.join(right, "k")
            .agg(F.count("*").alias("n"), F.sum(F.col("a") + F.col("b")).alias("s"))
            .collect()[0]
        )
        assert (got.n, got.s) == (want.n, want.s)
        # sanity: the un-bucketed join DOES shuffle under the same configs
        plain_plan = (
            left.join(right, "k")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_write_bucketed_qualified_name_cleans_stale_location(spark):
    """Regression: db.tbl resolves to <wh>/<db>.db/<tbl> — the stale-
    location cleanup must target that path (the old name.lower() join
    produced <wh>/db.tbl, never matching), so overwrite after a crash
    leftover succeeds instead of LOCATION_ALREADY_EXISTS."""
    import os

    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    try:
        df = spark.range(100).select(
            (F.col("id") % 10).alias("k"), F.col("id").alias("v")
        )
        write_bucketed(df, "bktdb.qual_tbl", ["k"], num_buckets=4)
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        loc = os.path.join(wh, "bktdb.db", "qual_tbl")
        assert os.path.isdir(loc)
        # simulate a crashed writer: catalog entry gone, directory left
        spark.sql("DROP TABLE bktdb.qual_tbl")
        os.makedirs(loc, exist_ok=True)
        open(os.path.join(loc, "leftover"), "w").close()
        write_bucketed(df, "bktdb.qual_tbl", ["k"], num_buckets=4)
        assert spark.table("bktdb.qual_tbl").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bktdb.qual_tbl")
        spark.sql("DROP DATABASE IF EXISTS bktdb")
