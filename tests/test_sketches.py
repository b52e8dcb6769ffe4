"""KMV distinct sketch (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators.sketches import (
    kmv_estimate,
    kmv_sketch,
    merge_kmv,
)
from de_gcp_lakehouse_iceberg_spark.tables import table


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)], "g string, v long"
    )
    out = kmv_estimate(kmv_sketch(df, ["g"], "v", k=64), k=64).collect()
    assert out[0].distinct_est == 10       # < k ⇒ exact by construction


def test_kmv_estimate_within_error_bound(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    k = 64
    est = {
        r.event_type: r.distinct_est
        for r in kmv_estimate(
            kmv_sketch(events, ["event_type"], "user_id", k=k), k=k
        ).collect()
    }
    exact = {
        r.event_type: r.d
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for g, d in exact.items():
        if d < k:
            assert est[g] == d
        else:
            assert abs(est[g] - d) / d < 0.5   # ~4σ at k=64


def test_kmv_merge_equals_sketch_of_union(spark):
    """Mergeability — the rollup property: merging two partial
    sketches gives EXACTLY the sketch of the unioned data."""
    a = spark.createDataFrame(
        [("g", i) for i in range(0, 400)], "g string, v long"
    )
    b = spark.createDataFrame(
        [("g", i) for i in range(200, 700)], "g string, v long"
    )
    k = 32
    merged = merge_kmv(
        kmv_sketch(a, ["g"], "v", k=k),
        kmv_sketch(b, ["g"], "v", k=k),
        ["g"],
        k=k,
    )
    direct = kmv_sketch(a.unionByName(b), ["g"], "v", k=k)
    assert merged.collect()[0].hashes == direct.collect()[0].hashes
    est_m = kmv_estimate(merged, k=k).collect()[0].distinct_est
    est_d = kmv_estimate(direct, k=k).collect()[0].distinct_est
    assert est_m == est_d
