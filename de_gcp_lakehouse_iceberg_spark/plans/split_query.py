"""q79 — deterministic train/val/test split census: per (split, lang)
doc counts plus an id checksum, so both the RANGE boundaries and the
membership are inside the hash gate. The split is a row-local hash
range test (operators/sampling.split_assign) — no shuffle, stable
under repartitioning, leak-free across corpus versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import split_assign, split_assign_sql
from ..tables import table
from .queries import register


@register(
    "q79_split_census",
    oracle=f"""
    WITH labeled AS (
      SELECT doc_id, lang,
             {split_assign_sql()} AS split
      FROM documents)
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM labeled
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def q79_split_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_corpus=False: split assignment is scan-time by contract
    # (test_plan_q79_split_is_scan_time pins a zero-exchange plan)
    docs = table(spark, sf_dir, "documents", spread_corpus=False)
    return (
        split_assign(docs)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("split", "lang")
    )
