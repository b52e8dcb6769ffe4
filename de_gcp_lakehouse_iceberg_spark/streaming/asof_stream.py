"""Streaming as-of join — the stream-stream form of operators/asof.py
(batch contract: attach the latest right row at-or-before each left
row's timestamp, per key).

Design: both streams are tagged and unioned (the same union-tag trick
the batch operator uses), then ONE applyInPandasWithState over the key
carries the latest right row as per-key state across micro-batches —
the state is a single (ts, payload) tuple per key, bounded by key
cardinality, never by stream volume (the applyInPandasWithState shape
proven by streaming/sessions.py). Within a micro-batch rows are
processed in (ts, right-first) order, so exact-timestamp matches count
(the published MERGE_ASOF default) and intra-batch disorder is
repaired by the sort.

Delivery contract (documented, standard for low-latency enrichment
joins): a left row is matched against every right row that arrived in
its own micro-batch or earlier. Cross-batch LATE right rows (arriving
after a left row was already emitted) do not retro-update — that is
the same trade every latest-quote streaming join makes; replaying a
bounded log in order reproduces the batch as-of exactly (asserted in
tests/test_asof_stream.py).

Scale posture: one shuffle on the key; state O(#keys × payload width);
no range-join explosion, no buffering of unmatched rows.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType, TimestampType


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Stream-stream backward as-of join; returns left rows with
    `prefix`-named right payload columns (NULL until a right row for
    the key has been seen). Payload columns must be atomic types."""
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, right_ts)]

    def _is_ts(c: str) -> bool:
        return isinstance(right.schema[c].dataType, TimestampType)

    # timestamps cross the Arrow boundary as exact long micros
    r = right.select(
        *by,
        F.unix_micros(F.col(right_ts)).alias("_ts_us"),
        F.lit(True).alias("_is_right"),
        *[
            (
                F.unix_micros(F.col(c)) if _is_ts(c) else F.col(c)
            ).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    l = left.select(
        *left.columns,
        F.unix_micros(F.col(left_ts)).alias("_ts_us"),
        F.lit(False).alias("_is_right"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    pay_names = [f"_r_{c}" for c in right_cols]
    state_schema = ", ".join(
        ["last_ts long"]
        + [
            f"p{i} "
            + ("long" if _is_ts(c) else right.schema[c].dataType.simpleString())
            for i, c in enumerate(right_cols)
        ]
    )
    out_struct = StructType(
        list(left.schema.fields)
        + [StructField(f"{prefix}{right_ts}_us", LongType())]
        + [
            StructField(
                f"{prefix}{c}",
                LongType() if _is_ts(c) else right.schema[c].dataType,
            )
            for c in right_cols
        ]
    )
    left_names = list(left.columns)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        # right rows first at equal ts → exact matches count
        rows = rows.sort_values(
            ["_ts_us", "_is_right"], ascending=[True, False], kind="mergesort"
        )
        if state.exists:
            st = tuple(state.get)
        else:
            st = (None,) + (None,) * len(right_cols)
        def _py(v):  # numpy scalars → plain Python for GroupState
            if v is None or (not isinstance(v, str) and pd.isna(v)):
                return None
            if hasattr(v, "item"):
                return v.item()
            return v

        out: list[tuple] = []
        for d in rows.to_dict("records"):
            if d["_is_right"]:
                st = (int(d["_ts_us"]),) + tuple(
                    _py(d[p]) for p in pay_names
                )
            else:
                out.append(tuple(d[c] for c in left_names) + st)
        state.update(st)
        if out:
            yield pd.DataFrame(
                out,
                columns=left_names
                + [f"{prefix}{right_ts}_us"]
                + [f"{prefix}{c}" for c in right_cols],
            )

    joined = unioned.groupBy(*by).applyInPandasWithState(
        fn,
        outputStructType=out_struct,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    final_cols = [F.col(c) for c in left_names]
    final_cols.append(
        F.timestamp_micros(F.col(f"{prefix}{right_ts}_us")).alias(
            f"{prefix}{right_ts}"
        )
    )
    for c in right_cols:
        col = F.col(f"{prefix}{c}")
        if _is_ts(c):
            col = F.timestamp_micros(col)
        final_cols.append(col.alias(f"{prefix}{c}"))
    return joined.select(*final_cols)
