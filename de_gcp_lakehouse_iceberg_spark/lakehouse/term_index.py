"""Maintained term-statistics index — the persisted corpus side of
BM25/TF-IDF retrieval (q107) under continuous ingestion.

The problem at 100 TB: document frequencies, corpus sizes, and average
document lengths are corpus-wide aggregates; recomputing them per
arriving batch is O(corpus) token re-reads. This index stores the
statistics as ADDITIVE DELTA ROWS in a snapshot-versioned LakeTable —
each ingested batch appends its own (lang, term, df) increments and a
per-language (n_docs, sum_len) increment in ONE atomic commit — and
readers aggregate the deltas (a vocabulary-sized rollup, never a
corpus re-scan). The same abelian-delta posture as `lakehouse/ivm.py`,
applied to exploded text.

Guarantees (mirrors `dedup_index.SignatureIndex`):
- **Exactly-once ingest** via write-audit-publish: stage → audit the
  staged delta-row count → publish; a crash before publish leaves the
  stats untouched.
- **Snapshot consistency**: a scorer reads ONE version's stats; time
  travel reproduces any historical ranking.
- Because every stat is an exact-integer sum of deltas, the stored
  stats are BIT-IDENTICAL to a from-scratch aggregation of the same
  documents, regardless of how ingestion was batched — the property
  q112 hash-gates.

Row layout (one table, so a batch's term and language increments
commit atomically): term rows (lang, term, df_delta, 0, 0) and
language rows (lang, NULL, 0, n_docs_delta, sum_len_delta).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from .table import LakeTable


class TermStatsIndex:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        self.table = LakeTable.load(spark, self.root)

    @classmethod
    def create(cls, spark: SparkSession, root: str) -> "TermStatsIndex":
        root = os.path.abspath(root)
        LakeTable.create(spark, root)
        return cls(spark, root)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "TermStatsIndex":
        return cls(spark, root)

    # -- ingest ---------------------------------------------------------
    def _deltas(
        self, docs: DataFrame, text_col: str, lang_col: str, id_col: str
    ) -> DataFrame:
        # ONE tokenize pass and ONE shuffle (r14, guide §2.3/§2.4):
        # per-document term dedup moves into `array_distinct` (the old
        # row-level distinct shuffled every token occurrence, and the
        # separate language branch re-tokenized the whole batch), and a
        # per-doc NULL-term sentinel row carries the token length, so a
        # single (lang, term) hash aggregation — with map-side partial
        # aggregation — yields both the term df deltas and the
        # per-language (n_docs, sum_len) deltas. Row set and schema are
        # identical to the old two-branch union.
        base = docs.select(
            F.col(lang_col).alias("lang"),
            F.coalesce(
                tokens(text_col), F.array().cast("array<string>")
            ).alias("_t"),
        )
        rows = base.select(
            "lang",
            F.size("_t").alias("_len"),
            F.explode(
                F.concat(
                    F.array_distinct("_t"),
                    F.array(F.lit(None).cast("string")),
                )
            ).alias("term"),
        )
        is_term = F.col("term").isNotNull()
        return rows.groupBy("lang", "term").agg(
            F.count(F.when(is_term, 1)).alias("df_delta"),
            F.count(F.when(~is_term, 1)).alias("n_docs_delta"),
            F.sum(F.when(~is_term, F.col("_len")).otherwise(0))
            .cast("long")
            .alias("sum_len_delta"),
        ).select(
            "lang", "term", "df_delta", "n_docs_delta", "sum_len_delta"
        )

    def ingest(
        self,
        docs: DataFrame,
        text_col: str = "text",
        lang_col: str = "lang",
        id_col: str = "doc_id",
        wap: bool = True,
    ) -> dict:
        """Add one batch's statistics increments in one atomic commit.
        wap=True stages, audits the staged row count, then publishes."""
        from pyspark.sql import Observation

        deltas = self._deltas(docs, text_col, lang_col, id_col)
        # the source-side audit count rides the checkpoint job as an
        # Observation metric, and the staged side is audited from fresh
        # parquet-footer reads of the staged files (r15 — the old form
        # paid one count job plus a full re-scan of the staged rows per
        # batch for the same two integers)
        obs = Observation()
        deltas = deltas.observe(
            obs, F.count(F.lit(1)).alias("n")
        ).localCheckpoint()
        if not wap:
            snap = self.table.append(deltas, operation="stats_append")
            return {"version": snap.version, "wap_id": None}
        n_batch = int(obs.get["n"] or 0)
        wap_id = self.table.stage_append(deltas)
        n_staged = self.table.audit_staged_rows(wap_id)
        if n_staged != n_batch:
            self.table.discard_staged(wap_id)
            raise RuntimeError(
                f"term-stats ingest audit failed: staged {n_staged}, "
                f"batch has {n_batch} delta rows — stage discarded"
            )
        snap = self.table.publish(wap_id)
        return {"version": snap.version, "wap_id": wap_id}

    # -- maintenance ------------------------------------------------------
    def compact_stats(self) -> dict:
        """Semantic compaction: fold the accumulated delta rows into
        one row per (lang, term) + one per lang, in a single overwrite
        commit. Reader results are bit-identical before and after
        (exact-integer sums); history (and so time travel to
        pre-compaction versions) is preserved by the snapshot log.
        Run this when deltas outgrow the vocabulary — read cost drops
        from O(vocab × batches) back to O(vocab)."""
        cur = self.table.snapshot()
        folded = (
            self.table.scan(version=cur.version)
            .groupBy("lang", "term")
            .agg(
                F.sum("df_delta").alias("df_delta"),
                F.sum("n_docs_delta").alias("n_docs_delta"),
                F.sum("sum_len_delta").alias("sum_len_delta"),
            )
        )
        snap = self.table.overwrite(folded, operation="stats_compact")
        return {"version": snap.version, "from_version": cur.version}

    # -- read -----------------------------------------------------------
    def term_stats(self, version: int | None = None) -> DataFrame:
        """(lang, term, df) — exact document frequencies at a version."""
        return (
            self.table.scan(version=version)
            .filter(F.col("term").isNotNull())
            .groupBy("lang", "term")
            .agg(F.sum("df_delta").alias("df"))
        )

    def lang_stats(self, version: int | None = None) -> DataFrame:
        """(lang, n_docs, sum_len) — corpus sizes at a version."""
        return (
            self.table.scan(version=version)
            .filter(F.col("term").isNull())
            .groupBy("lang")
            .agg(
                F.sum("n_docs_delta").alias("n_docs"),
                F.sum("sum_len_delta").alias("sum_len"),
            )
        )
