"""q106 — distributed BPE tokenizer training over the documents
corpus: learn 8 merges, gate the full merge table (order, operands,
pair counts) AND the corpus token count after each merge.

The DuckDB oracle unrolls the merge loop as 8 CTE stages — each stage
counts adjacent symbol pairs from the marker-wrapped vocabulary,
argmaxes with the same (count DESC, lhs, rhs) tie-break, and applies
the winner via scalar-subquery `replace()` — so the gate verifies the
iteration order, the greedy non-overlapping application semantics
(tokens_after is measured from the rewritten strings, NOT prev-count,
which diverges whenever the winning pair self-overlaps), and the exact
integer arithmetic, not just the final vocabulary.

See `operators/bpe.py` for the scale analysis (one corpus shuffle;
iterations run on the vocabulary-sized word table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.bpe import bpe_learn
from ..tables import table
from .queries import register

_N_MERGES = 8


def _oracle(n: int) -> str:
    m2, m3 = "chr(2)", "chr(3)"
    parts = [
        "WITH words AS MATERIALIZED (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq"
        " FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)"
        " WHERE w <> '' GROUP BY w)",
        f"seq0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', {m2}||'\\1'||{m3},"
        " 'g') AS seq, freq FROM words)",
    ]
    for k in range(n):
        parts.append(
            f"pairs{k} AS MATERIALIZED (SELECT u.p.a AS lhs, u.p.b AS rhs,"
            " CAST(sum(freq) AS BIGINT) AS pair_count FROM ("
            f"  SELECT unnest(list_zip(l[1:length(l)-1], l[2:length(l)])"
            "::STRUCT(a VARCHAR, b VARCHAR)[]) AS p, freq FROM ("
            f"   SELECT string_split(rtrim(ltrim(seq, {m2}), {m3}),"
            f" {m3}||{m2}) AS l, freq FROM seq{k}) s"
            " WHERE length(l) >= 2) u GROUP BY lhs, rhs)"
        )
        parts.append(
            f"best{k} AS MATERIALIZED (SELECT lhs, rhs, pair_count FROM pairs{k}"
            " ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
        )
        parts.append(
            f"seq{k + 1} AS MATERIALIZED (SELECT replace(seq,"
            f" (SELECT {m2}||lhs||{m3}||{m2}||rhs||{m3} FROM best{k}),"
            f" (SELECT {m2}||lhs||rhs||{m3} FROM best{k})) AS seq, freq"
            f" FROM seq{k})"
        )
        parts.append(
            f"tok{k} AS MATERIALIZED (SELECT CAST(sum(freq * (length(seq) -"
            f" length(replace(seq, {m2}, '')))) AS BIGINT) AS t"
            f" FROM seq{k + 1})"
        )
    union = " UNION ALL ".join(
        f"SELECT {k} AS step, lhs, rhs, pair_count,"
        f" (SELECT t FROM tok{k}) AS tokens_after FROM best{k}"
        for k in range(n)
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST(step AS INT) AS step, lhs, rhs, pair_count,"
        f" tokens_after FROM ({union}) ORDER BY step"
    )


@register("q106_bpe_merges", oracle=_oracle(_N_MERGES))
def q106_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return bpe_learn(spark, docs, "text", n_merges=_N_MERGES)
