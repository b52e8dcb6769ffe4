"""Sequence packing for LLM training — concatenate documents per stream
and split into fixed-capacity context windows (the "pack to 2048/4096
tokens" step between cleaning and tokenized shards).

Semantics (the GPT-style concat-then-chunk): within a stream (e.g. a
language), documents are laid out in `order_col` order; the running
token offset determines each document's chunk:

    chunk_id = floor(tokens_before_this_doc / capacity)

i.e. a document belongs to the window in which its first token lands.
This is a single window-sum over (stream, order) — one shuffle on the
stream key, exact integer arithmetic, and directly expressible in SQL,
which makes the whole operator oracle-checkable (q51). At 100 TB the
window partitions by stream × shard-date so no single partition holds
the corpus; chunk ids stay stable because the offset is per-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_chunks(
    docs: DataFrame,
    capacity: int,
    stream_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Assign each document its context-window `chunk_id` (plus its
    `n_tokens` and starting `tok_offset` within the stream)."""
    tok = F.col(token_col) if token_col else token_count(text_col)
    w = W.partitionBy(stream_col).orderBy(order_col)
    offset = F.coalesce(
        F.sum(tok).over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return (
        docs.withColumn("n_tokens", tok.cast("long"))
        .withColumn("tok_offset", offset.cast("long"))
        .withColumn(
            "chunk_id",
            ((F.col("tok_offset") - F.col("tok_offset") % capacity) / capacity)
            .cast("long"),
        )
    )


def chunk_stats(packed: DataFrame, capacity: int, stream_col: str = "lang") -> DataFrame:
    """Per-(stream, chunk) packing report: document count, token load,
    and fill ratio vs capacity (the packing-efficiency metric)."""
    return (
        packed.groupBy(stream_col, "chunk_id")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_tokens").alias("chunk_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.floor(
                F.col("chunk_tokens").cast("double") / capacity * 10000
                + F.lit(0.5)
            )
            / 10000,
        )
    )


def chunk_text(
    text_col,
    chunk_tokens: int,
    stride: int,
):
    """Overlapping context-window chunking — split a document's tokens
    into windows of `chunk_tokens`, stepping by `stride` (< chunk ⇒
    overlap; the sliding-window chunking RAG/long-context pipelines
    use). Returns an array<struct<chunk_idx, chunk_text, n_tokens>> —
    explode at the call site. Pure Column expressions: one narrow pass
    per row, no shuffle; chunk starts are 0, stride, 2·stride, … while
    start < token_count, and the final chunk may be short."""
    from ..functions.text import tokens

    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    t = tokens(text_col)
    k = F.size(t)
    # number of chunks = floor((k-1)/stride) + 1  (k ≥ 1 always: even
    # an empty string tokenizes to [''])
    n_chunks = F.floor((k - F.lit(1)) / F.lit(stride)) + F.lit(1)
    return F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - F.lit(1)),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(t, i * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), k - i * F.lit(stride)
            ).cast("long").alias("n_tokens"),
        ),
    )
