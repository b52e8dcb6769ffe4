"""Interval (range) join — pair left rows with right rows of the same
key whose timestamp falls in ``[left_ts − lower, left_ts + upper]``.
The attribution primitive (purchase ↔ preceding click) and the second
canonical "Spark lacks a named operator" join after as-of
(operators/asof.py).

Batch form: equi-join on the key with the range as a join-time
predicate — Catalyst plans the equi-part as a hash/sort-merge join and
evaluates the range inside the join, so cost is per-key pair volume,
not a cross product. At 100 TB the key (user) bounds the fan-out and
AQE splits skewed users.

Streaming form: a real Spark stream-stream inner join. BOTH sides get
watermarks and the range condition doubles as the state-retention
bound — Spark derives how long each side's rows must be buffered from
the time-interval condition, so state is bounded by (watermark + range
width), the documented production pattern for attribution pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float = 0.0,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner interval join; works for batch AND streaming inputs.

    Returns left columns + right's non-key columns. Column names must
    not collide outside `by` (callers alias; keeps the operator free of
    silent renames).
    """
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    gap = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts))
    cond = (gap >= -hi_us) & (gap <= lo_us)
    for c in by:
        cond = cond & (l[c] == r[c])
    return l.join(r, cond).drop(*[r[c] for c in by])
