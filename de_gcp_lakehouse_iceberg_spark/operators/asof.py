"""As-of join — attach to each left row the most recent right row at or
before its timestamp, per key (the time-series point-in-time join the
reference's SQL surface lacks; named in SURVEY.md §7 as a custom-operator
target. Semantics follow the widely-published MERGE_ASOF contract:
backward direction, exact matches allowed, optional tolerance).

Spark-first design — NO range join, NO per-key loop: both sides are
tagged and unioned, then ONE window pass per (key, ts) order carries the
latest right payload forward onto every left row. Cost is a single
shuffle on the key + an in-partition sort; at 100 TB that is the same
shape as any keyed window aggregate, with no quadratic candidate
explosion. The right payload rides in ONE struct column so
`last(..., ignorenulls=True)` picks whole rows atomically (per-column
carries could mix values from different right rows when a right payload
column is legitimately NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_MARK = "_asof_is_right"
_TS = "_asof_ts"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join.

    Returns every `left` row with `prefix`-named copies of `right_cols`
    (default: all right columns except the keys and its ts) taken from
    the latest right row with ``right_ts <= left_ts`` for the same `by`
    key — NULLs when no prior right row exists (left-outer semantics).
    `tolerance_seconds` additionally NULLs matches older than the
    tolerance, plus a `{prefix}{right_ts}` column carrying the matched
    right timestamp.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, right_ts)]
    payload_fields = [right_ts, *right_cols]

    r = right.select(
        *by,
        F.col(right_ts).alias(_TS),
        F.lit(True).alias(_MARK),
        F.struct(*[F.col(c) for c in payload_fields]).alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(False).alias(_MARK),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    # right rows sort BEFORE left rows at equal ts (exact matches count,
    # the published default); ordering within the union is total because
    # (ts, side) is unique per key for any sane input — ties between two
    # right rows resolve to the later window position deterministically
    # only if the caller's data has unique (key, ts) per side.
    w = (
        W.partitionBy(*by)
        .orderBy(F.col(_TS).asc(), F.col(_MARK).desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        l.unionByName(r.select(*by, _TS, _MARK, _PAYLOAD), allowMissingColumns=True)
        .withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .filter(~F.col(_MARK))
    )
    matched_ts = F.col(f"{_PAYLOAD}.{right_ts}")
    if tolerance_seconds is not None:
        in_tol = (
            F.unix_micros(F.col(left_ts)) - F.unix_micros(matched_ts)
            <= int(tolerance_seconds * 1_000_000)
        )
        carried = carried.withColumn(
            _PAYLOAD, F.when(in_tol, F.col(_PAYLOAD))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(matched_ts.alias(f"{prefix}{right_ts}"))
    out_cols.extend(
        F.col(f"{_PAYLOAD}.{c}").alias(f"{prefix}{c}") for c in right_cols
    )
    return carried.select(*out_cols)
