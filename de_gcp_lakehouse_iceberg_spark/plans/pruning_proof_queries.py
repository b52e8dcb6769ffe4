"""q67 — hidden-partition pruning proof for the bucket() and
truncate() transforms (q60 already gates timestamp-range stats
pruning; this closes the two transform families it doesn't touch).

Events land in two LakeTables — one partitioned `bucket(8, user_id)`,
one `truncate(256, event_id)` — with one data file per partition value
(coalesce(1) before a single append). Queries then filter on the RAW
columns; the planner maps the predicates through the transforms
(transforms.py: bucket ⇒ equality-only, truncate ⇒ monotone ranges)
and the footer stats finish the job. The result row carries
planned-vs-total file counts for BOTH tables, so the pruning itself —
not just the row results — is inside the driver's hash gate.

The oracle states the SEMANTIC file counts: with one file per
partition value, `files planned` for a predicate must equal the number
of distinct transformed values among matching rows, and `files total`
the number of distinct transformed values overall. Any conservative
over-keep (e.g. truncate mapping `<` as `<=` without the stats pass)
or wrongful prune breaks the hash.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable
from ..tables import table
from .queries import register
from .workdir import scratch

_ROOT = scratch("lakehouse_pruning_proof")
_BUCKETS = 8
_TRUNC = 256
_TRUNC_CAP = 4096  # truncate table loads event_id < cap → ≤16 partition
#                    files at ANY scale factor (file counts must stay
#                    bounded for a gated single-writer table build)
_USER_EQ = 7  # bucket-equality probe: user_id = 7 → bucket 7


@register(
    "q67_bucket_prune_proof",
    oracle=f"""
    SELECT
      CAST((SELECT count(DISTINCT user_id % {_BUCKETS}) FROM events)
           AS BIGINT) AS bucket_files_total,
      CAST((SELECT count(DISTINCT user_id % {_BUCKETS}) FROM events
            WHERE user_id = {_USER_EQ}) AS BIGINT) AS bucket_files_planned,
      CAST((SELECT count(*) FROM events WHERE user_id = {_USER_EQ})
           AS BIGINT) AS bucket_rows,
      CAST((SELECT count(DISTINCT event_id // {_TRUNC}) FROM events
            WHERE event_id < {_TRUNC_CAP}) AS BIGINT) AS trunc_files_total,
      CAST((SELECT count(DISTINCT event_id // {_TRUNC}) FROM events
            WHERE event_id < {_TRUNC}) AS BIGINT) AS trunc_files_planned,
      CAST((SELECT count(*) FROM events WHERE event_id < {_TRUNC})
           AS BIGINT) AS trunc_rows
    """,
)
def q67_bucket_prune_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)

    tb = LakeTable.create(
        spark,
        os.path.join(root, "by_bucket"),
        partition_by=[f"bucket({_BUCKETS}, user_id)"],
    )
    tb.append(events.coalesce(1), operation="load")
    tt = LakeTable.create(
        spark,
        os.path.join(root, "by_trunc"),
        partition_by=[f"truncate({_TRUNC}, event_id)"],
    )
    tt.append(
        events.filter(F.col("event_id") < _TRUNC_CAP).coalesce(1),
        operation="load",
    )

    b_snap, b_planned = tb.plan_files(where=[("user_id", "=", _USER_EQ)])
    b_rows = tb.scan(where=[("user_id", "=", _USER_EQ)]).count()
    t_snap, t_planned = tt.plan_files(where=[("event_id", "<", _TRUNC)])
    t_rows = tt.scan(where=[("event_id", "<", _TRUNC)]).count()

    return spark.createDataFrame(
        [
            (
                len(b_snap.files),
                len(b_planned),
                b_rows,
                len(t_snap.files),
                len(t_planned),
                t_rows,
            )
        ],
        "bucket_files_total long, bucket_files_planned long, "
        "bucket_rows long, trunc_files_total long, "
        "trunc_files_planned long, trunc_rows long",
    ).select(
        "bucket_files_total",
        "bucket_files_planned",
        "bucket_rows",
        "trunc_files_total",
        "trunc_files_planned",
        "trunc_rows",
    )
