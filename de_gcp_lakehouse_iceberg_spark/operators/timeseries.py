"""Time-series resampling with gap filling — the "regularize an event
stream onto a fixed grid" operator every monitoring/feature pipeline
needs (hourly features from irregular events; the reference's hourly
dashboards assume the grid exists).

Semantics (deterministic, engine-replayable):

1. bucket events to epoch-hour integers, aggregate the measure with
   the exact decimal-sum mean (6dp floor-round — the engine's _davg
   convention);
2. build the full [min_hour, max_hour] grid PER GROUP (sequence +
   explode — no driver loop);
3. left join observations onto the grid;
4. fill gaps by LINEAR INTERPOLATION between the nearest observed
   neighbors (carry (hour, value) structs with last/first
   IGNORE NULLS windows), falling back to nearest-edge values before
   the first / after the last observation.

Scale: one shuffle for the hourly aggregate, one window pass per
direction over (group, hour) rows — grid size is hours·groups, tiny
relative to events at any corpus size. The interpolation arithmetic
is IEEE mul/div on identical inputs → bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_US_PER_HOUR = 3_600_000_000


def _r6(c: Column) -> Column:
    return F.floor(c * 1_000_000 + F.lit(0.5)) / F.lit(1_000_000)


def resample_hourly(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Returns (group, hour, observed, filled, is_gap): one row per
    group per hour of the group's [min, max] span; `observed` is the
    6dp exact-decimal hourly mean (NULL on gap hours), `filled` the
    gap-filled series."""
    hours = events.select(
        F.col(group_col).alias("g"),
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(_US_PER_HOUR))
        .cast("long")
        .alias("h"),
        F.col(value_col).alias("v"),
    )
    hourly = hours.groupBy("g", "h").agg(
        _r6(
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("observed")
    )
    grid = (
        hourly.groupBy("g")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("g", F.explode(F.sequence("lo", "hi")).alias("h"))
    )
    joined = grid.join(hourly, ["g", "h"], "left")

    obs = F.when(
        F.col("observed").isNotNull(), F.struct("h", "observed")
    )
    w_back = (
        W.partitionBy("g")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("g")
        .orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    with_nb = joined.withColumn(
        "_prev", F.last(obs, ignorenulls=True).over(w_back)
    ).withColumn("_next", F.first(obs, ignorenulls=True).over(w_fwd))

    ph, pv = F.col("_prev.h"), F.col("_prev.observed")
    nh, nv = F.col("_next.h"), F.col("_next.observed")
    interp = pv + (nv - pv) * (F.col("h") - ph) / (nh - ph)
    filled = F.when(F.col("observed").isNotNull(), F.col("observed")).otherwise(
        _r6(
            F.when(F.col("_prev").isNotNull() & F.col("_next").isNotNull(), interp)
            .otherwise(F.coalesce(pv, nv))
        )
    )
    return with_nb.select(
        F.col("g").alias(group_col),
        "h",
        "observed",
        filled.alias("filled"),
        F.col("observed").isNull().alias("is_gap"),
    )
