"""PII scrub: redaction output, per-category counts, attribution order."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators.pii import pii_counts, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    counts = pii_counts("text")
    row = df.select(
        redact_pii("text").alias("red"),
        *[v.alias(k) for k, v in counts.items()],
    ).collect()[0]
    return row


def test_redacts_all_categories(spark):
    row = _one(
        spark,
        "mail a@b.co or call 415-555-1234, ssn 123-45-6789, host 10.0.0.1",
    )
    assert row.red == (
        "mail <EMAIL> or call <PHONE>, ssn <SSN>, host <IP>"
    )
    assert (row.email, row.phone, row.ssn, row.ipv4) == (1, 1, 1, 1)


def test_email_digits_not_double_counted_as_phone(spark):
    row = _one(spark, "reach 555-123-4567@example.com ok")
    assert row.email == 1 and row.phone == 0
    assert row.red == "reach <EMAIL> ok"


def test_clean_text_untouched(spark):
    text = "the quick brown fox 42 times"
    row = _one(spark, text)
    assert row.red == text
    assert row.email == row.phone == row.ssn == row.ipv4 == 0


def test_null_text_stays_null(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert df.select(redact_pii("text").alias("r")).collect()[0].r is None
