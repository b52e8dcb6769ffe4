"""q68/q69 — snapshot refs, rollback, write-audit-publish, and
partition-spec evolution under the driver's hash gate.

q68 proves spec evolution prunes PER FILE SPEC (Iceberg spec-id
model): a table partitioned `days(ts)` evolves to
`days(ts) + bucket(8, user_id)` mid-life; planned-vs-total file
counts for a user-equality probe and a ts-range probe, split by era,
go inside the hash. The oracle states the semantic counts: one file
per partition value per era (coalesce(1) appends), old-era files
prunable only by footer stats, new-era files by bucket/days transform
AND stats.

q69 proves the tag → bad-load → rollback → WAP stage/audit/publish
lifecycle end to end (Iceberg snapshot refs + cherry-pick publish;
reference manages Iceberg tables via BigQuery,
sql/create_iceberg_tables.sql). Version numbers are deterministic
(create=0, load=1, bad=2, rollback=3, publish=4), so the snapshot
arithmetic itself is hash-gated alongside the row results.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable
from ..lakehouse.evolution import set_partition_spec
from ..tables import table
from .queries import _dsum, _r, register
from .workdir import scratch

_ROOT = scratch("lakehouse_refs_queries")
_CUTOFF = dt.datetime(2024, 1, 16)  # exact day boundary at every SF
_UID = 7  # bucket-7 probe: every other bucket-7 user is ≥ 15


@register(
    "q68_spec_evolution_prune",
    oracle=f"""
    WITH even_days AS (
      SELECT date_trunc('day', ts) AS d,
             min(user_id) AS mn, max(user_id) AS mx,
             max(ts) AS mxts
      FROM events WHERE event_id % 2 = 0 GROUP BY 1),
    odd_parts AS (
      SELECT date_trunc('day', ts) AS d, user_id % 8 AS b,
             min(user_id) AS mn, max(user_id) AS mx
      FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2)
    SELECT
      CAST((SELECT count(*) FROM even_days) AS BIGINT)
        AS old_files_total,
      CAST((SELECT count(*) FROM odd_parts) AS BIGINT)
        AS new_files_total,
      CAST((SELECT count(*) FROM even_days
            WHERE mn <= {_UID} AND mx >= {_UID}) AS BIGINT)
        AS old_planned_user,
      CAST((SELECT count(*) FROM odd_parts
            WHERE b = {_UID} % 8 AND mn <= {_UID} AND mx >= {_UID})
           AS BIGINT) AS new_planned_user,
      CAST((SELECT count(*) FROM events WHERE user_id = {_UID})
           AS BIGINT) AS rows_user,
      CAST((SELECT count(*) FROM even_days
            WHERE mxts >= TIMESTAMP '2024-01-16') AS BIGINT)
        AS old_planned_ts,
      CAST((SELECT count(*) FROM odd_parts
            WHERE d >= TIMESTAMP '2024-01-16') AS BIGINT)
        AS new_planned_ts,
      CAST((SELECT count(*) FROM events
            WHERE ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS rows_ts
    """,
)
def q68_spec_evolution_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    root = os.path.join(_ROOT, "q68_" + os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)

    # repartition on the partition-value expressions: each partition
    # value lands in exactly one task → still ONE file per partition
    # value (the oracle's counting model), but written in parallel
    # instead of a single coalesce(1) task.
    from ..lakehouse.transforms import parse_spec

    day = parse_spec("days(ts)").expr()
    bucket = parse_spec("bucket(8, user_id)").expr()

    t = LakeTable.create(spark, root, partition_by=["days(ts)"])
    t.append(
        events.filter(F.col("event_id") % 2 == 0).repartition(8, day),
        operation="load_v1_spec",
    )
    set_partition_spec(t, ["days(ts)", "bucket(8, user_id)"])
    t.append(
        events.filter(F.col("event_id") % 2 == 1).repartition(
            16, day, bucket
        ),
        operation="load_v2_spec",
    )

    old_spec = ["days(ts)"]

    def _split(files):
        old = sum(1 for f in files if f.spec == old_spec)
        return old, len(files) - old

    _s, all_files = t.plan_files()
    old_total, new_total = _split(all_files)
    _s, p_user = t.plan_files(where=[("user_id", "=", _UID)])
    old_pu, new_pu = _split(p_user)
    rows_user = t.scan(where=[("user_id", "=", _UID)]).count()
    _s, p_ts = t.plan_files(where=[("ts", ">=", _CUTOFF)])
    old_pt, new_pt = _split(p_ts)
    rows_ts = t.scan(where=[("ts", ">=", _CUTOFF)]).count()

    return spark.createDataFrame(
        [(old_total, new_total, old_pu, new_pu, rows_user,
          old_pt, new_pt, rows_ts)],
        "old_files_total long, new_files_total long, "
        "old_planned_user long, new_planned_user long, rows_user long, "
        "old_planned_ts long, new_planned_ts long, rows_ts long",
    )


@register(
    "q69_wap_rollback",
    oracle="""
    SELECT
      CAST(4 AS BIGINT) AS final_version,
      CAST(5 AS BIGINT) AS n_snapshots,
      CAST((SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0)
           AS BIGINT) AS tag_rows,
      CAST((SELECT count(*) FROM orders WHERE o_orderkey % 3 IN (0, 1))
           AS BIGINT) AS rows_before_rollback,
      CAST((SELECT count(*) FROM orders WHERE o_orderkey % 3 = 2)
           AS BIGINT) AS staged_rows,
      CAST((SELECT count(*) FROM orders WHERE o_orderkey % 3 <> 1)
           AS BIGINT) AS final_rows,
      (SELECT floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                    AS DOUBLE) * 100 + 0.5) / 100
       FROM orders WHERE o_orderkey % 3 <> 1) AS final_price_sum
    """,
)
def q69_wap_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    root = os.path.join(_ROOT, "q69_" + os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)

    part = F.col("o_orderkey") % 3
    t = LakeTable.create(spark, root)                       # v0
    t.append(orders.filter(part == 0).coalesce(1))          # v1: good load
    good = t.current_version()
    t.set_tag("audited")
    t.append(orders.filter(part == 1).coalesce(1))          # v2: bad load
    rows_before_rollback = t.scan().count()
    t.rollback_to(good)                                     # v3
    tag_rows = t.scan(tag="audited").count()

    wap = t.stage_append(orders.filter(part == 2).coalesce(1))
    staged_rows = t.scan_staged(wap, include_base=False).count()  # audit
    t.publish(wap)                                          # v4

    final = t.scan()
    agg = final.agg(
        F.count("*").alias("final_rows"),
        _r(_dsum("o_totalprice", scale=6), 2).alias("final_price_sum"),
    )
    return agg.select(
        F.lit(t.current_version()).cast("long").alias("final_version"),
        F.lit(len(t.snapshots())).cast("long").alias("n_snapshots"),
        F.lit(tag_rows).cast("long").alias("tag_rows"),
        F.lit(rows_before_rollback).cast("long").alias("rows_before_rollback"),
        F.lit(staged_rows).cast("long").alias("staged_rows"),
        F.col("final_rows"),
        F.col("final_price_sum"),
    )
