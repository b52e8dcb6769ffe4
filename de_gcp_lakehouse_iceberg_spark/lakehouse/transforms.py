"""Hidden partition transforms — the Iceberg partition-spec model
(iceberg partition transforms: identity / days / hours / months /
bucket / truncate) re-expressed for the LakeTable manifest layer.

"Hidden" = callers declare `partition_by=["days(ts)"]` once at CREATE;
writers never materialize a date column, and readers filter on the RAW
source column (`scan(where=[("ts", ">=", t)])`) — the scan planner maps
the predicate through the transform and prunes partitions before Spark
plans. Monotone transforms (days/hours/months, integer truncate) map
range predicates conservatively (x ≥ v ⇒ t(x) ≥ t(v)); bucket maps
equality only. Every mapping keeps a file unless it PROVABLY cannot
match — the exact row-level predicate is always applied afterwards.

Bucket hashing is the engine's portable affine family (pmod), not
Iceberg's murmur3 — same capability, engine-local layout.
"""

from __future__ import annotations

import datetime as dt
import functools
import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000

_SPEC_RE = re.compile(
    r"^\s*(?:(?P<fn>days|hours|months)\s*\(\s*(?P<c1>\w+)\s*\)"
    r"|(?P<fn2>bucket|truncate)\s*\(\s*(?P<arg>\d+)\s*,\s*(?P<c2>\w+)\s*\)"
    r"|(?P<ident>\w+))\s*$"
)


@dataclass(frozen=True)
class Transform:
    spec: str       # canonical spec string (stored in table properties)
    kind: str       # identity|days|hours|months|bucket|truncate
    source: str     # source column name
    arg: int | None = None

    @property
    def name(self) -> str:
        """Partition-field name (manifest dict key / directory name)."""
        if self.kind == "identity":
            return self.source
        suffix = {"days": "day", "hours": "hour", "months": "month",
                  "bucket": "bucket", "truncate": "trunc"}[self.kind]
        return f"{self.source}_{suffix}"

    # -- Spark side -----------------------------------------------------
    def expr(self) -> Column:
        c = F.col(self.source)
        if self.kind == "identity":
            return c
        if self.kind == "days":
            return F.floor(F.unix_micros(c) / F.lit(_US_PER_DAY)).cast("long")
        if self.kind == "hours":
            return F.floor(F.unix_micros(c) / F.lit(_US_PER_HOUR)).cast("long")
        if self.kind == "months":
            return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("long")
        if self.kind == "bucket":
            return F.pmod(F.col(self.source).cast("long"), F.lit(self.arg))
        if self.kind == "truncate":
            return (F.floor(c.cast("long") / self.arg) * self.arg).cast("long")
        raise ValueError(self.kind)

    # -- Python side (literal → partition value, for pruning) -----------
    def apply(self, v):
        if self.kind == "identity":
            return v
        if self.kind in ("days", "hours", "months"):
            if not isinstance(v, dt.datetime):
                return None
            epoch = dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            # Exact integer micros (float total_seconds() truncates
            # ~1% of microsecond values, mispruning boundary files).
            us = (v - epoch) // dt.timedelta(microseconds=1)
            if self.kind == "days":
                return us // _US_PER_DAY
            if self.kind == "hours":
                return us // _US_PER_HOUR
            return (v.year - 1970) * 12 + v.month - 1
        if not isinstance(v, int):
            return None
        if self.kind == "bucket":
            return v % self.arg
        if self.kind == "truncate":
            return (v // self.arg) * self.arg
        raise ValueError(self.kind)

    def prune(self, op: str, value, part_value: str) -> bool:
        """May a file with partition value `part_value` hold rows
        matching (source op value)? Conservative: True when unsure."""
        tv = self.apply(value)
        if tv is None:
            return True
        try:
            pv = int(part_value) if self.kind != "identity" else part_value
        except (TypeError, ValueError):
            return True
        if self.kind == "identity":
            pv, tv = str(pv), str(tv)
            if op in ("=", "=="):
                return pv == tv
            return True  # identity strings: only equality is safe
        if self.kind == "bucket":
            # hash-style: ONLY equality maps through
            return op not in ("=", "==") or pv == tv
        # monotone non-decreasing transforms
        if op in ("=", "=="):
            return pv == tv
        if op in (">", ">="):
            return pv >= tv
        if op in ("<", "<="):
            return pv <= tv
        return True


@functools.lru_cache(maxsize=1024)
def parse_spec(spec: str) -> Transform:
    m = _SPEC_RE.match(spec)
    if not m:
        raise ValueError(f"bad partition spec {spec!r}")
    if m.group("ident"):
        return Transform(spec=m.group("ident"), kind="identity",
                         source=m.group("ident"))
    if m.group("fn"):
        return Transform(spec=f"{m.group('fn')}({m.group('c1')})",
                         kind=m.group("fn"), source=m.group("c1"))
    return Transform(
        spec=f"{m.group('fn2')}({m.group('arg')},{m.group('c2')})",
        kind=m.group("fn2"),
        source=m.group("c2"),
        arg=int(m.group("arg")),
    )
