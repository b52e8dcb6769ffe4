"""q91 — join-driven file skipping (runtime-filter) proof under the
driver hash gate.

The fact table (orders) is range-clustered into 15 lakehouse files by
`o_custkey // W` (the layout `maintenance.recluster` produces on the
join key) with per-file blooms on o_custkey. The dimension side
(customers of one nation with high balance) yields a SMALL key set;
`lakehouse/runtime_filter.scan_with_join_filter` harvests it and
prunes fact files per key through the full stats ∧ bloom check before
Spark plans the scan — the BigQuery semi-join pushdown the reference
gets for free (PRD.md:829-844, FR-008), at the manifest layer.

The oracle replays BOTH prunings exactly: per-file [min, max] of
o_custkey from the same `k // W` layout, and the Kirsch–Mitzenmacher
bloom positions OR-ed from every row — so planned-vs-total file counts
(including bloom false positives) hash-match bit-for-bit, alongside
the exact join aggregate over the surviving rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable
from ..lakehouse.bloom import _A1, _A2, _B1, _B2, _P, add_bloom_filters
from ..lakehouse.runtime_filter import scan_with_join_filter
from ..tables import table
from .queries import _dsum, register
from .workdir import scratch

_ROOT = scratch("lakehouse_runtime_filter")
_FILES = 15
_BITS = 65536
_K = 5
_DIM_PRED = "c_nationkey = 3 AND c_acctbal > 9000"


@register(
    "q91_join_runtime_filter",
    oracle=f"""
    WITH w AS (
      SELECT (count(*) + {_FILES - 1}) // {_FILES} AS w FROM customer),
    dim AS (
      SELECT DISTINCT c_custkey AS key FROM customer WHERE {_DIM_PRED}),
    facts AS (
      SELECT o_custkey // w.w AS f, o_custkey, o_totalprice
      FROM orders, w),
    fstats AS (
      SELECT f, min(o_custkey) AS lo, max(o_custkey) AS hi
      FROM facts GROUP BY f),
    fh AS (
      SELECT f,
             ((o_custkey % {_P}) * {_A1} + {_B1}) % {_P} AS h1,
             ((o_custkey % {_P}) * {_A2} + {_B2}) % {_P} AS h2
      FROM facts),
    fpos AS (
      SELECT DISTINCT f,
             unnest(list_transform(range(0, {_K}),
                    i -> (h1 + i * h2) % {_BITS})) AS p
      FROM fh),
    kh AS (
      SELECT key,
             ((key % {_P}) * {_A1} + {_B1}) % {_P} AS h1,
             ((key % {_P}) * {_A2} + {_B2}) % {_P} AS h2
      FROM dim),
    kpos AS (
      SELECT DISTINCT key,
             unnest(list_transform(range(0, {_K}),
                    i -> (h1 + i * h2) % {_BITS})) AS p
      FROM kh),
    kn AS (SELECT key, CAST(count(*) AS BIGINT) AS nb
           FROM kpos GROUP BY key),
    stats_surv AS (
      SELECT DISTINCT s.f
      FROM fstats s JOIN dim d ON d.key BETWEEN s.lo AND s.hi),
    bloom_hits AS (
      SELECT fp.f, kp.key, CAST(count(*) AS BIGINT) AS c
      FROM fpos fp JOIN kpos kp ON fp.p = kp.p
      GROUP BY fp.f, kp.key),
    full_surv AS (
      SELECT DISTINCT h.f
      FROM bloom_hits h
      JOIN kn ON h.key = kn.key
      JOIN fstats s ON h.f = s.f
      JOIN dim d ON d.key = h.key AND d.key BETWEEN s.lo AND s.hi
      WHERE h.c = kn.nb),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orders,
             coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 0.0) AS revenue
      FROM facts JOIN dim ON facts.o_custkey = dim.key)
    SELECT
      CAST({_FILES} AS BIGINT) AS files_total,
      CAST((SELECT count(*) FROM stats_surv) AS BIGINT) AS stats_planned,
      CAST((SELECT count(*) FROM full_surv) AS BIGINT) AS join_planned,
      CAST((SELECT count(*) FROM dim) AS BIGINT) AS n_keys,
      agg.n_orders, agg.revenue
    FROM agg
    """,
)
def q91_join_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = table(spark, sf_dir, "customer")
    n_cust = customer.count()
    w = (n_cust + _FILES - 1) // _FILES

    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(spark, root)
    # one clustered commit — same 15 per-band files (and footer stats /
    # blooms) the old 15-iteration append loop produced, in ONE Spark
    # job + ONE snapshot (r14: the loop serialized 15 full commit
    # cycles; the band filter bound keeps the historical behavior of
    # dropping any row past the last band)
    band = (F.col("o_custkey") / w).cast("long")
    t.append_clustered(
        orders.filter(band.between(0, _FILES - 1)),
        band,
        _FILES,
        operation="load_cluster",
    )
    dim = customer.filter(F.expr(_DIM_PRED))

    # stats-only pruning (pre-bloom), then the full runtime filter
    from ..lakehouse.runtime_filter import harvest_keys

    keys = harvest_keys(dim, "c_custkey")
    _s, stats_planned = t.plan_files(where=[("o_custkey", "in", keys)])
    add_bloom_filters(t, ["o_custkey"], bits=_BITS, k=_K)
    df, info = scan_with_join_filter(t, "o_custkey", dim, "c_custkey")
    agg = df.agg(
        F.count("*").alias("n_orders"),
        F.coalesce(_dsum("o_totalprice"), F.lit(0.0)).alias("revenue"),
    ).first()

    return spark.createDataFrame(
        [(
            info["files_total"],
            len(stats_planned),
            info["files_planned"],
            info["n_keys"],
            agg["n_orders"],
            float(agg["revenue"]),
        )],
        "files_total long, stats_planned long, join_planned long, "
        "n_keys long, n_orders long, revenue double",
    )
