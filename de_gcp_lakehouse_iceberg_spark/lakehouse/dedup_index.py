"""Maintained MinHash signature index — the persisted corpus side of
the incremental dedup probe (`operators/dedup.lsh_probe_pairs`).

This is the reference's continuous-ingestion posture
(`main.py:362-370`: every arriving batch lands transactionally in the
lakehouse) applied to the dedup index: instead of re-signing the whole
corpus on every incoming batch (O(corpus) text re-reads per batch —
q88's standalone shape), the per-document (keys, sig) rows live in a
snapshot-versioned LakeTable that ingest UPDATES and probes READ.

Guarantees:
- **Exactly-once ingest** via write-audit-publish: `append(wap=True)`
  stages the batch's signature rows, audits the staged row count
  against the batch, then publishes — a crash before publish leaves the
  index untouched (staged files are invisible and GC-able).
- **Snapshot consistency**: probes run against one index snapshot;
  concurrent appends create new versions, never mutate what a running
  probe reads. Time travel (`version=`) reproduces any historical
  probe.
- **Family pinning**: the (n, num_hashes) MinHash family is recorded in
  `index.json` at create time and re-checked on load/probe — a probe
  with mismatched constants would silently return garbage candidates,
  so it raises instead.

Scale: the index stores one row per document (8-byte id + key/sig
arrays), ~1-2% the bytes of the corpus text. Probe cost is
O(batch × collisions) — independent of corpus text size, which is the
whole point at 100 TB.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lsh_probe_pairs, signature_index
from .table import LakeTable

_CONFIG = "index.json"


class SignatureIndex:
    """A LakeTable of (doc_id, keys array<long>, sig array<long>)
    rows in the portable MinHash family, maintained transactionally."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        with open(os.path.join(self.root, _CONFIG)) as f:
            cfg = json.load(f)
        self.n: int = cfg["n"]
        self.num_hashes: int = cfg["num_hashes"]
        self.table = LakeTable.load(spark, self.root)

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        n: int = 3,
        num_hashes: int = 64,
    ) -> "SignatureIndex":
        root = os.path.abspath(root)
        LakeTable.create(spark, root)
        cfg = {"n": n, "num_hashes": num_hashes, "family": "portable"}
        tmp = os.path.join(root, _CONFIG + ".tmp")
        with open(tmp, "w") as f:
            json.dump(cfg, f)
        os.replace(tmp, os.path.join(root, _CONFIG))
        return cls(spark, root)

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "SignatureIndex":
        return cls(spark, root)

    # -- ingest --------------------------------------------------------
    def append(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        wap: bool = True,
        extra_summary: dict | None = None,
    ) -> dict:
        """Sign `docs` (one Arrow pass) and add the rows to the index.

        wap=True is the exactly-once path: stage → audit (staged
        signature count == signable batch count; any mismatch means a
        partial/duplicated write and the stage is discarded) → publish.
        `extra_summary` rides on the publishing commit itself — the
        streaming ingest anchors its batch watermark there atomically.
        Returns {"rows": n, "version": v, "wap_id": ...}."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        # materialize the signing ONCE: the WAP path consumes sigs
        # twice (file write + audit count) and would otherwise run the
        # Arrow signing pass per consumer. The source-side audit count
        # rides the checkpoint job as an Observation metric and the
        # staged side is audited from fresh parquet-footer reads (r15 —
        # the old form paid a count job plus a full staged re-scan per
        # ingest for the same two integers).
        obs = Observation()
        sigs = (
            signature_index(docs, id_col, text_col, self.n, self.num_hashes)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if not wap:
            snap = self.table.append(
                sigs, operation="index_append", summary=extra_summary
            )
            return {"rows": snap.summary.get("added_rows"),
                    "version": snap.version, "wap_id": None}
        n_batch = int(obs.get["n"] or 0)
        wap_id = self.table.stage_append(sigs)
        n_staged = self.table.audit_staged_rows(wap_id)
        if n_staged != n_batch:
            self.table.discard_staged(wap_id)
            raise RuntimeError(
                f"index ingest audit failed: staged {n_staged} rows, "
                f"batch signs to {n_batch} — stage discarded"
            )
        snap = self.table.publish(wap_id, extra_summary=extra_summary)
        return {"rows": n_staged, "version": snap.version, "wap_id": wap_id}

    # -- read / probe --------------------------------------------------
    def df(self, version: int | None = None) -> DataFrame:
        return self.table.scan(version=version)

    def probe(
        self,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        bands: int = 32,
        threshold: float = 0.5,
        version: int | None = None,
    ) -> DataFrame:
        """(new_id, corpus_id, jaccard) — the incoming batch against the
        STORED signatures of one index snapshot. The corpus text is
        never touched; band hashes and the exact-Jaccard verify both
        come from the stored (keys, sig) rows."""
        return lsh_probe_pairs(
            new_docs,
            None,
            id_col=id_col,
            text_col=text_col,
            n=self.n,
            num_hashes=self.num_hashes,
            bands=bands,
            threshold=threshold,
            hash_mode="portable",
            corpus_index=self.df(version=version),
        )

    def dedup_batch(
        self,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        bands: int = 32,
        threshold: float = 0.5,
    ) -> DataFrame:
        """The full continual-ingestion step: probe, drop batch docs
        that near-dup the corpus, ingest the survivors' signatures
        (WAP), and return the surviving docs."""
        hits = (
            self.probe(new_docs, id_col, text_col, bands, threshold)
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        kept = new_docs.join(hits, id_col, "left_anti").localCheckpoint()
        self.append(kept, id_col, text_col, wap=True)
        return kept
