"""q60 — stats-pruned lakehouse time-range scan: events land in a
LakeTable (one file per append batch), then a timestamp-range query
runs through `scan(where=...)` — the manifest's footer-harvested
[min,max] stats drop non-matching files BEFORE Spark plans the read.
The oracle is the plain range aggregate over the source table: pruning
must be invisible in the result, visible only in files planned (the
query also RETURNS the planned-vs-total file counts so the driver's
hash gate verifies the pruning actually happened).

All window arithmetic is integer epoch-micros in BOTH engines — no
interval division, so the cut point is bit-identical."""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable
from ..tables import table
from .queries import _davg, register
from .workdir import scratch

_ROOT = scratch("lakehouse_skipping_queries")
_N_BATCHES = 4


def _us_to_dt(us: int) -> dt.datetime:
    # tz-AWARE UTC on purpose: PySpark converts a NAIVE datetime literal
    # with the Python process's local TZ (TimestampType.toInternal uses
    # time.mktime), so a naive cut point shifts with the driver's TZ env
    # no matter what spark.sql.session.timeZone says. An aware datetime
    # converts identically everywhere.
    return dt.datetime(
        1970, 1, 1, tzinfo=dt.timezone.utc
    ) + dt.timedelta(microseconds=us)


@register(
    "q60_stats_pruned_scan",
    oracle=f"""
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
    cut AS (
      -- the query window: the last quarter of the event-time range
      SELECT lo + (hi - lo) * 3 // 4 AS start_us FROM bounds),
    hit AS (
      SELECT e.* FROM events e, cut WHERE epoch_us(e.ts) >= cut.start_us)
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*) * 100 + 0.5) / 100 AS avg_value,
           CAST(1 AS BIGINT) AS files_planned,
           CAST({_N_BATCHES} AS BIGINT) AS files_total
    FROM hit
    """,
)
def q60_stats_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    lo_us, hi_us = events.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    start_us = lo_us + (hi_us - lo_us) * 3 // 4

    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(spark, root)
    # one file with its own stats per contiguous time slice — the
    # shape a daily ingest produces naturally. r14: the slice index is
    # computed as a closed-form expression (count of slice starts at or
    # below the event time — exactly the [s_i, s_i+1) membership the
    # old per-slice filter loop expressed), so the load is ONE
    # clustered commit instead of _N_BATCHES sequential ones; per-file
    # row sets, and so footer stats, are identical.
    starts = [
        lo_us + (hi_us - lo_us) * i // _N_BATCHES
        for i in range(1, _N_BATCHES)
    ]
    slice_idx = sum(
        (F.unix_micros("ts") >= s).cast("int") for s in starts
    )
    t.append_clustered(
        events, slice_idx, _N_BATCHES, operation="load_slices"
    )

    snap, planned = t.plan_files(where=[("ts", ">=", _us_to_dt(start_us))])
    hit = t.scan(where=[("ts", ">=", _us_to_dt(start_us))])
    return hit.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        _davg("value", 2).alias("avg_value"),
        F.lit(len(planned)).cast("long").alias("files_planned"),
        F.lit(len(snap.files)).cast("long").alias("files_total"),
    )
