"""Streaming query corpus entry — q25 replays the events stream through
a REAL Structured Streaming query (readStream → watermark → windowed
agg → memory sink) and must match the same DuckDB oracle as the batch
q22 (SURVEY.md Q22 stream/batch equivalence)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import replay_windowed_aggregate
from .queries import ORACLE_SQL, register


@register("q25_streaming_tumbling", oracle=ORACLE_SQL["q22_tumbling_window"])
def q25_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return replay_windowed_aggregate(spark, sf_dir)
