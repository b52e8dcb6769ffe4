"""Python UDTF surface: SQL LATERAL chunk_docs equals the DataFrame
chunk_text expression form row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.functions.table_functions import (
    register_udtfs,
)
from de_gcp_lakehouse_iceberg_spark.operators.packing import chunk_text


def test_chunk_docs_udtf_matches_expression_form(spark, sf_dir):
    register_udtfs(spark)
    from de_gcp_lakehouse_iceberg_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    via_sql = {
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
            FROM udtf_docs d, LATERAL chunk_docs(d.text, 64, 48) c
            """
        ).collect()
    }
    via_expr = {
        (r.doc_id, r.c.chunk_idx, r.c.chunk_text, r.c.n_tokens)
        for r in docs.select(
            "doc_id", F.explode(chunk_text("text", 64, 48)).alias("c")
        ).collect()
    }
    assert via_sql == via_expr and via_sql


def test_chunk_docs_udtf_null_text_yields_nothing(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_null")
    rows = spark.sql(
        "SELECT * FROM udtf_null d, LATERAL chunk_docs(d.text, 4, 3) c"
    ).collect()
    assert rows == []
