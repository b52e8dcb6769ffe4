"""Gap-based sessionization — batch (window functions) and streaming
(custom stateful operator via applyInPandasWithState).

The batch form is the classic lag/flag/cumsum construction, fully
SQL-expressible (oracle-checked as q29). The streaming form is the
engine's demonstration of Spark's arbitrary-stateful API: per-key state
carries the open session across micro-batches; sessions CLOSE when an
event arrives more than `gap` after the previous one, and closed
sessions are emitted downstream exactly once.

Scale posture: both forms shuffle once on the session key (user).
Streaming state is one small tuple per active user — bounded by key
cardinality, not event volume; the state store handles spill/recovery.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"
GAP_SECONDS_DEFAULT = 1800  # 30 min


def batch_sessions(
    events: DataFrame,
    gap_seconds: int = GAP_SECONDS_DEFAULT,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """lag → gap flag → cumulative sum = session id → aggregate."""
    w = W.partitionBy(user_col).orderBy(ts_col)
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    ).withColumn(
        # exact micros (unix_timestamp would truncate sub-second parts
        # and disagree with the streaming form / the oracle's epoch_us)
        "new_session",
        F.when(
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w)) > gap_seconds * 1_000_000,
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    sessioned = flagged.withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .drop("session_id")
    )


_OUT_COLS = ["user_id", "start_us", "end_us", "n_events", "total_value"]


def _session_fn(gap_seconds: int, idle_timeout_seconds: int | None = None):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if idle_timeout_seconds is not None and state.hasTimedOut:
            # no event arrived within the idle window: flush the OPEN
            # session and drop the state — without this, a user who
            # simply stops emitting never gets their last session
            # downstream (the batch form has end-of-input; a stream
            # does not).
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield pd.DataFrame(
                    [(user_id, start, last, n, total)], columns=_OUT_COLS
                )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts_us")
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        closed = []
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            if start is None:
                start, last, n, total = ts_us, ts_us, 1, float(value)
            elif ts_us - last > gap_seconds * 1_000_000:
                closed.append((user_id, start, last, n, total))
                start, last, n, total = ts_us, ts_us, 1, float(value)
            else:
                last = max(last, ts_us)
                n += 1
                total += float(value)
        state.update((start, last, n, total))
        if idle_timeout_seconds is not None:
            state.setTimeoutDuration(idle_timeout_seconds * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=_OUT_COLS)

    return fn


def streaming_sessions(
    events: DataFrame,
    gap_seconds: int = GAP_SECONDS_DEFAULT,
    idle_timeout_seconds: int | None = None,
) -> DataFrame:
    """Custom stateful sessionization over a stream: emits CLOSED
    sessions only (open sessions live in per-user state across
    micro-batches). Input needs (user_id, ts, value).

    With `idle_timeout_seconds`, a per-key PROCESSING-TIME timeout also
    flushes a session whose user has gone quiet — the state store never
    accumulates keys forever, and the tail session reaches downstream
    without waiting for a next event that may never come."""
    prepared = events.select(
        "user_id",
        (F.unix_micros(F.col("ts"))).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )
    out = prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds, idle_timeout_seconds),
        outputStructType=(
            "user_id bigint, start_us long, end_us long, "
            "n_events bigint, total_value double"
        ),
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_seconds is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    return out.select(
        "user_id",
        F.timestamp_micros(F.col("start_us")).alias("session_start"),
        F.timestamp_micros(F.col("end_us")).alias("session_end"),
        "n_events",
        "total_value",
    )
