"""PII scrubbing — the redaction pass a training corpus runs before
anything else (emails, phone numbers, SSN-shaped ids, IPv4 addresses →
typed placeholder tokens). Pure Column expressions: a chain of
``regexp_replace`` calls that stays JVM-side inside codegen — one
narrow projection over the scan, no shuffle, no UDF, which is exactly
what a 100 TB scrub pass needs.

Patterns are intentionally conservative, well-published shapes (the
goal is the operator plumbing and the measurement surface; production
deployments swap in their own pattern set). ``redact_pii`` applies the
replacements in a fixed order so counts and outputs are deterministic;
``pii_counts`` measures per-category hit counts BEFORE redaction so the
pipeline can report what it scrubbed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: email before phone (an email's digits must not be
# half-eaten by the phone pattern), SSN before phone (both digit runs)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"(\+?\d{1,2}[\s.-])?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4}\b",
        "<PHONE>",
    ),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its typed placeholder."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category match counts on the RAW text (Column per category).

    Counted in the same order redaction applies, on the progressively
    redacted string — so overlapping categories are attributed the way
    the redactor actually consumes them (an email's digits never also
    count as a phone)."""
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for name, pattern, token in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(c, F.lit(pattern), 0))
        c = F.regexp_replace(c, pattern, token)
    return out
