"""q63 — CDC replica sync, hash-gated end-to-end: a source LakeTable
takes appends + updates + deletes, the changelog between snapshots is
applied to a replica created from the PRE-DML snapshot, and the query
returns the replica's end-state census. The oracle computes the same
end state directly over the `supplier` source — so the hash gate
verifies changelog capture AND apply semantics, not just row counts."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable, dml
from ..tables import table
from .queries import register
from .workdir import scratch

_ROOT = scratch("lakehouse_cdc_queries")


@register(
    "q63_cdc_replica_sync",
    oracle="""
    WITH endstate AS (
      SELECT s_suppkey,
             CAST(s_acctbal AS DECIMAL(18,2))
               + CASE WHEN s_nationkey < 5 THEN 1 ELSE 0 END AS bal,
             s_nationkey
      FROM supplier
      WHERE s_suppkey % 7 <> 0
      UNION ALL
      -- the backfill append happens BEFORE the update, so appended
      -- rows with s_nationkey < 5 also take the +1
      SELECT s_suppkey + 100000,
             CAST(s_acctbal AS DECIMAL(18,2))
               + CASE WHEN s_nationkey < 5 THEN 1 ELSE 0 END,
             s_nationkey
      FROM supplier WHERE s_suppkey % 2 = 0 AND (s_suppkey + 100000) % 7 <> 0)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT s_nationkey) AS BIGINT) AS n_nations,
           CAST(sum(bal) AS DOUBLE) AS total_bal
    FROM endstate
    """,
)
def q63_cdc_replica_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.col("s_acctbal").cast("decimal(18,2)").alias("s_acctbal"),
    )
    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)

    src = LakeTable.create(spark, os.path.join(root, "src"))
    src.append(sup)
    v0 = src.current_version()
    replica = LakeTable.create(spark, os.path.join(root, "replica"))
    replica.append(src.scan(version=v0))

    # source evolves: backfill append, slice update, slice delete
    src.append(
        sup.filter(F.col("s_suppkey") % 2 == 0).withColumn(
            "s_suppkey", F.col("s_suppkey") + 100_000
        )
    )
    # all-text UPDATE so changelog() replays its net diff from the
    # removed files' pred-true slice (r14 fast path) instead of a
    # two-sided exceptAll over every affected file's full row set
    dml.update(src, {"s_acctbal": "s_acctbal + 1"}, "s_nationkey < 5")
    dml.delete(src, "s_suppkey % 7 = 0")

    feed = dml.changelog(src, v0, src.current_version())
    dml.apply_changelog(replica, feed, key_cols=["s_suppkey"])
    return replica.scan().agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("s_nationkey").alias("n_nations"),
        F.sum("s_acctbal").cast("double").alias("total_bal"),
    )
