"""q66 — PII scrub over the documents corpus (operators/pii.py made
driver-gated). The synthetic corpus contains no natural PII, so the
query plants deterministic PII derived from doc_id (an email, a phone,
an SSN, an IP) into every document, then measures what the scrubber
finds and removes. Everything stays in pure Column expressions /
regexp_replace — JVM-side, zero shuffle beyond the final tiny agg —
and the DuckDB oracle replays the identical plant + scrub chain, so
category counts AND the redacted-text length checksum are hash-gated.

Reference parity note: the reference anonymizes columns with UPDATE
(PRD.md:790-797); this operator is the corpus-scale text-level
equivalent a training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.pii import PII_PATTERNS, pii_counts, redact_pii
from ..tables import table
from .queries import register


def _planted(doc_id):
    """Deterministic PII text planted per doc (same in both engines)."""
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@example.com or +1 555-123-4567, ssn 123-45-6789, host 10.0."),
        (doc_id % 200).cast("string"),
        F.lit(".77"),
    )


_ORACLE_PLANT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or +1 555-123-4567, ssn 123-45-6789, host 10.0.' || "
    "CAST(doc_id % 200 AS VARCHAR) || '.77'"
)


def _oracle_sql() -> str:
    # replay the ordered redaction chain: count on the progressively
    # redacted string, exactly as pii_counts does
    cols: list[str] = []
    cur = "txt"
    ctes = [f"SELECT source, {_ORACLE_PLANT} AS txt FROM documents"]
    for i, (name, pattern, token) in enumerate(PII_PATTERNS):
        pat = pattern.replace("'", "''")
        carry = "".join(f"{c}_n, " for c in cols)
        ctes.append(
            f"SELECT source, {carry}"
            f"len(regexp_extract_all({cur}, '{pat}')) AS {name}_n, "
            f"regexp_replace({cur}, '{pat}', '{token}', 'g') AS t{i} "
            f"FROM s{i}"
        )
        cur = f"t{i}"
        cols.append(name)
    with_clauses = ",\n    ".join(
        f"s{i} AS ({c})" for i, c in enumerate(ctes)
    )
    sums = ",\n       ".join(
        f"CAST(sum({n}_n) AS BIGINT) AS {n}_hits" for n in cols
    )
    return f"""
    WITH {with_clauses}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           {sums},
           CAST(sum(length({cur})) AS BIGINT) AS redacted_chars
    FROM s{len(PII_PATTERNS)}
    GROUP BY source
    ORDER BY source
    """


@register("q66_pii_scrub", oracle=_oracle_sql())
def q66_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").withColumn(
        "txt", _planted(F.col("doc_id"))
    )
    counts = pii_counts("txt")
    scored = docs.select(
        "source",
        *[c.alias(f"{n}_n") for n, c in counts.items()],
        F.length(redact_pii("txt")).alias("red_len"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                F.sum(f"{n}_n").alias(f"{n}_hits")
                for n, _, _ in PII_PATTERNS
            ],
            F.sum("red_len").alias("redacted_chars"),
        )
        .orderBy("source")
    )
