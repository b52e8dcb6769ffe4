"""q29 — gap-based sessionization (batch form of streaming/sessions.py):
lag → gap flag → cumulative-sum session id → per-session aggregate →
session-size histogram. The oracle rebuilds the identical construction
in DuckDB SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.sessions import batch_sessions
from ..tables import table
from .queries import _r, register

_GAP_S = 300


@register(
    "q29_sessionization",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_id,
             min(ts) AS session_start, max(ts) AS session_end,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM sessioned GROUP BY user_id, session_id
    )
    SELECT n_events AS session_size,
           CAST(count(*) AS BIGINT) AS session_count,
           floor(CAST(sum(epoch_us(session_end) - epoch_us(session_start)) AS DOUBLE) / 1000000
                 / count(*) * 100 + 0.5) / 100 AS avg_duration_s,
           CAST(sum(CAST(total_value AS DECIMAL(18,2))) AS DOUBLE)
             AS total_value
    FROM sessions
    GROUP BY session_size
    ORDER BY session_size
    """,
)
def q29_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    sessions = batch_sessions(ev, gap_seconds=_GAP_S)
    return (
        sessions.groupBy(F.col("n_events").alias("session_size"))
        .agg(
            F.count("*").alias("session_count"),
            _r(
                F.sum(
                    F.unix_micros(F.col("session_end"))
                    - F.unix_micros(F.col("session_start"))
                ).cast("double")
                / 1_000_000
                / F.count("*"),
                2,
            ).alias("avg_duration_s"),
            F.sum(F.col("total_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("session_size")
    )
