"""q65 — temperature-flattened source mixing (α=0.5): per-source kept
counts plus the kept-id checksum, hash-gated — the oracle recomputes
the sqrt-rate thresholds from the same counts and constants (sqrt is
IEEE-correctly-rounded in every engine, so the integer thresholds are
bit-identical)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import SAMPLE_P, id_hash_sql, temperature_mix
from ..tables import table
from .queries import register


@register(
    "q65_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source),
    th AS (
      SELECT source,
             CAST(floor(sqrt(CAST((SELECT min(n) FROM counts) AS DOUBLE)
                             / n) * {SAMPLE_P} + 0.5) AS BIGINT) AS t
      FROM counts)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS kept_docs,
           CAST(sum(d.doc_id) AS BIGINT) AS kept_id_sum
    FROM documents d JOIN th ON d.source = th.source
    WHERE {id_hash_sql('d.doc_id')} < th.t
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def q65_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    kept = temperature_mix(docs, alpha=0.5)
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("doc_id").alias("kept_id_sum"),
        )
        .orderBy("source")
    )
