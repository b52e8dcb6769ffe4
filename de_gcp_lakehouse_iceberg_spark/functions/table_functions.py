"""Python UDTFs (Spark 4 table functions) — the UDTF surface class from
SURVEY.md §2.12. The reference keeps one-row-to-many logic in Beam
DoFns; Spark's native answer is a table function usable from SQL with
LATERAL. `chunk_docs` mirrors operators/packing.chunk_text exactly
(same starts/stride/short-tail semantics — pinned equal in tests), so
SQL users get the chunker without touching the DataFrame API.

UDTFs run row-at-a-time in Python — the DataFrame `chunk_text`
expression form stays the hot path; this is the SQL-surface adapter.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx bigint, chunk_text string, n_tokens bigint")
class ChunkDocs:
    """LATERAL chunk_docs(text, chunk_tokens, stride) — one output row
    per sliding window (starts 0, stride, 2·stride, … while < #tokens;
    final chunk may be short). NULL text yields no rows."""

    def eval(self, text: str, chunk_tokens: int, stride: int):
        if text is None:
            return
        if chunk_tokens <= 0 or stride <= 0:
            raise ValueError("chunk_tokens and stride must be positive")
        toks = text.split(" ")
        k = len(toks)
        n_chunks = (k - 1) // stride + 1
        for i in range(n_chunks):
            start = i * stride
            window = toks[start : start + chunk_tokens]
            yield i, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register every table function on the session (idempotent)."""
    spark.udtf.register("chunk_docs", ChunkDocs)
