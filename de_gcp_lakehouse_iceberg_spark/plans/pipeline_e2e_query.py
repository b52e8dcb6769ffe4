"""q74 — the COMPOSED end-to-end corpus build, hash-gated as one
query: quality/lang filter → exact dedup → n-gram near-dup removal
(q44's stages) → benchmark decontamination over the survivors (q54's
broadcast-shingle shape) → deterministic shuffle-shard export (q71's
order-sensitive checksum). Proves the pipeline operators COMPOSE —
every intermediate set feeds the next stage and one wrong doc anywhere
changes the final per-shard checksums.

The oracle chains the already-proven CTE fragments over the same
constants; the contamination stage runs over the CLEANED corpus (eval
docs that survived cleaning define the shingle set — self-consistent
with the operator's single-input contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import clean_corpus, contamination_overlap
from ..operators.sampling import id_hash_sql
from ..operators.sharding import shuffle_shard
from ..tables import table
from .dedup_queries import _SHINGLE_SQL
from .queries import register
from .text_queries import _QUALITY_SQL_EXPR

_QUALITY_T = 0.7
_LANGS = ("en", "de", "fr")
_JACCARD_T = 0.5
_EVAL_MOD = 97
_CONTAM_T = 0.3
_N_SHARDS = 4


@register(
    "q74_corpus_build_e2e",
    oracle=f"""
    WITH kept0 AS (
      SELECT doc_id, lang, text FROM documents
      WHERE {_QUALITY_SQL_EXPR} >= {_QUALITY_T}
        AND lang IN {tuple(_LANGS)}
    ),
    deduped AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               row_number() OVER (PARTITION BY text ORDER BY doc_id)
                 AS rn
        FROM kept0
      ) WHERE rn = 1
    ),
    documents_d AS (SELECT * FROM deduped),
    {_SHINGLE_SQL.replace("FROM documents", "FROM documents_d")},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS common
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b),
    losers AS (
      SELECT DISTINCT p.doc_b AS doc_id
      FROM pairs p
      JOIN sizes sa ON p.doc_a = sa.doc_id
      JOIN sizes sb ON p.doc_b = sb.doc_id
      WHERE CAST(p.common AS DOUBLE) / (sa.n + sb.n - p.common)
            >= {_JACCARD_T}),
    cleaned AS (
      SELECT doc_id FROM deduped
      WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
    exc AS (
      SELECT ex.doc_id, ex.s FROM ex JOIN cleaned USING (doc_id)),
    eval_sh AS (
      SELECT DISTINCT s FROM exc WHERE doc_id % {_EVAL_MOD} = 0),
    train AS (SELECT * FROM exc WHERE doc_id % {_EVAL_MOD} <> 0),
    contaminated AS (
      SELECT doc_id FROM (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (
                 WHERE t.s IN (SELECT s FROM eval_sh)) AS BIGINT) AS hits
        FROM train t GROUP BY t.doc_id)
      WHERE CAST(hits AS DOUBLE) / n >= {_CONTAM_T}),
    final AS (
      SELECT doc_id FROM cleaned
      WHERE doc_id % {_EVAL_MOD} <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
    shard_h AS (
      SELECT doc_id, {id_hash_sql('doc_id')} AS hh FROM final),
    o AS (
      SELECT doc_id, hh % {_N_SHARDS} AS shard,
             row_number() OVER (PARTITION BY hh % {_N_SHARDS}
                                ORDER BY hh, doc_id) AS pos
      FROM shard_h)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
    FROM o
    GROUP BY shard
    ORDER BY shard
    """,
)
def q74_corpus_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # use_lsh=True: the composed pipeline runs the SCALE route for its
    # near-dup stage. The oracle stays the exact-Jaccard CTE — valid by
    # the q64 argument (b=32/r=2 banding: P(candidate | J≥0.5) ≈
    # 1−1e-4, and the corpus's qualifying pairs sit far above
    # threshold; equality of the two pair sets is test-pinned), so the
    # gate is a live proof the LSH route loses nothing end-to-end.
    cleaned = clean_corpus(
        docs,
        quality_threshold=_QUALITY_T,
        langs=list(_LANGS),
        jaccard_threshold=_JACCARD_T,
        use_lsh=True,
    )
    # Materialize the cleaned corpus once: three downstream consumers
    # (eval split, contamination shingles, final anti-joins) would each
    # replay the full cleaning plan otherwise. At 100 TB this is the
    # standard inter-stage write-to-storage point; in-session,
    # localCheckpoint is its equivalent.
    cleaned = cleaned.localCheckpoint()
    eval_ids = cleaned.filter(
        F.col("doc_id") % _EVAL_MOD == 0
    ).select("doc_id")
    overlap = contamination_overlap(cleaned, eval_ids)
    contaminated = overlap.filter(
        F.col("overlap") >= F.lit(_CONTAM_T)
    ).select("doc_id")
    final = (
        cleaned.select("doc_id")
        .join(eval_ids, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
    )
    sharded = shuffle_shard(final, _N_SHARDS)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("pos") * F.col("doc_id")).alias("order_checksum"),
        )
        .orderBy("shard")
    )
