"""q73 — bloom-filter file-skipping proof under the driver hash gate.

Events are striped across 8 files by event_id % 8, so every file's
[min, max] spans the full id range and stats pruning keeps ALL files
for an equality probe — only the bloom can prune. The oracle replays
the bloom EXACTLY: per stripe, the distinct bit positions OR-ed from
every row's Kirsch–Mitzenmacher double-hash positions; a stripe
survives the probe iff it contains every probe bit. That reproduces
even the false positives, so planned-vs-total file counts hash-match
bit-for-bit across engines.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import LakeTable
from ..lakehouse.bloom import (
    _A1,
    _A2,
    _B1,
    _B2,
    _P,
    _positions_py,
    add_bloom_filters,
)
from ..tables import table
from .queries import register
from .workdir import scratch

_ROOT = scratch("lakehouse_bloom_queries")
_FILES = 8
_BITS = 131072   # ~10 bits/row at sf0.1's 12.5k rows/file → FPR < 1%
_K = 5
_PROBE = 123     # event_ids are 0..N-1 at every SF (N ≥ 1000)


def _probe_bits() -> list[int]:
    return sorted(set(_positions_py(_PROBE, _BITS, _K)))


@register(
    "q73_bloom_prune_proof",
    oracle=f"""
    WITH h AS (
      SELECT event_id % {_FILES} AS f,
             ((event_id % {_P}) * {_A1} + {_B1}) % {_P} AS h1,
             ((event_id % {_P}) * {_A2} + {_B2}) % {_P} AS h2
      FROM events),
    pos AS (
      SELECT DISTINCT f,
             unnest(list_transform(range(0, {_K}),
                    i -> (h1 + i * h2) % {_BITS})) AS p
      FROM h),
    surviving AS (
      SELECT f FROM pos
      WHERE p IN ({', '.join(map(str, _probe_bits()))})
      GROUP BY f
      HAVING count(DISTINCT p) = {len(_probe_bits())})
    SELECT
      CAST({_FILES} AS BIGINT) AS files_total,
      CAST({_FILES} AS BIGINT) AS stats_planned,
      CAST((SELECT count(*) FROM surviving) AS BIGINT) AS bloom_planned,
      CAST((SELECT count(*) FROM events WHERE event_id = {_PROBE})
           AS BIGINT) AS rows_match
    """,
)
def q73_bloom_prune_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events").select("event_id", "user_id")
    root = os.path.join(_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(root, ignore_errors=True)

    t = LakeTable.create(spark, root)
    # one clustered commit — identical per-stripe files to the old
    # _FILES-iteration append loop, one Spark job + one snapshot (r14)
    t.append_clustered(
        events,
        F.col("event_id") % _FILES,
        _FILES,
        operation="load_stripe",
    )
    _s, stats_planned = t.plan_files(where=[("event_id", "=", _PROBE)])
    add_bloom_filters(t, ["event_id"], bits=_BITS, k=_K)
    snap, bloom_planned = t.plan_files(where=[("event_id", "=", _PROBE)])
    rows = t.scan(where=[("event_id", "=", _PROBE)]).count()

    return spark.createDataFrame(
        [(len(snap.files), len(stats_planned), len(bloom_planned), rows)],
        "files_total long, stats_planned long, bloom_planned long, "
        "rows_match long",
    )
