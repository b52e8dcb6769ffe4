"""Streaming incremental corpus dedup — the SignatureIndex
(lakehouse/dedup_index.py) driven by Structured Streaming.

Each micro-batch of documents is probed against the STORED corpus
signatures (band join on the index — the corpus text is never read),
near-duplicates of the corpus are dropped, and the survivors'
signatures are ingested into the index so LATER batches dedup against
them too. This is the reference's continuous-ingestion loop
(`main.py:362-370`) composed with the dedup index: the pipeline that
keeps a 100 TB corpus duplicate-free as it grows, at per-batch cost
O(batch × collisions).

Exactly-once: at-least-once delivery (checkpointed offsets) + the
idempotent-commit watermark of `stream_append_to_laketable` — each
batch's id rides in the INDEX table's snapshot summary
(`stream_watermarks`), so a replayed micro-batch is skipped instead of
re-probed/re-appended (a replay would otherwise see its own batch-1
signatures in the index and drop everything as duplicates). Within a
batch, probe + append happen before the watermark commit is visible,
and the append itself is WAP (stage → audit → publish).

Intra-batch duplicates: the probe is batch-vs-index only, so two
near-identical docs ARRIVING TOGETHER both survive the probe. The
standard fix (applied here) runs the in-batch pair pass
(`minhash_lsh_pairs`) over the survivors first — batch-local cost,
no corpus involvement.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lakehouse.dedup_index import SignatureIndex
from ..operators.dedup import minhash_lsh_pairs


def streaming_dedup_ingest(
    source: DataFrame,
    index: SignatureIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 32,
    threshold: float = 0.5,
    dedup_within_batch: bool = True,
    checkpoint_name: str = "dedup_ingest",
    poll_timeout_s: float = 120.0,
) -> dict:
    """Run the streaming source (bounded; availableNow) through
    probe → drop → ingest. Returns {"batches": n, "kept": n, "dropped": n}.
    Kept/dropped counts are per-run (not replayed batches)."""
    stats = {"batches": 0, "kept": 0, "dropped": 0}

    def _commit(df: DataFrame, batch_id: int) -> None:
        wm = index.table.snapshot().summary.get("stream_watermarks", {})
        if batch_id <= wm.get(checkpoint_name, -1):
            return
        if df.isEmpty():
            return
        batch = df.select(id_col, text_col).localCheckpoint()
        n_in = batch.count()
        if dedup_within_batch:
            pairs = minhash_lsh_pairs(
                batch,
                id_col=id_col,
                text_col=text_col,
                n=index.n,
                num_hashes=index.num_hashes,
                bands=bands,
                threshold=threshold,
                hash_mode="portable",
            )
            losers = pairs.select(
                F.greatest("doc_a", "doc_b").alias(id_col)
            ).distinct()
            batch = batch.join(losers, id_col, "left_anti")
        hits = (
            index.probe(batch, id_col, text_col, bands, threshold)
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        kept = batch.join(hits, id_col, "left_anti").localCheckpoint()
        n_kept = kept.count()
        # WAP ingest of the survivors' signatures; the batch watermark
        # rides the publishing commit itself (extra_summary → one
        # atomic snapshot), so a replayed batch is skipped before any
        # probe — it can never see its own signatures in the index.
        index.append(
            kept,
            id_col,
            text_col,
            wap=True,
            extra_summary={
                "stream_watermarks": {checkpoint_name: batch_id}
            },
        )
        stats["batches"] += 1
        stats["kept"] += n_kept
        stats["dropped"] += n_in - n_kept

    q = (
        source.writeStream.foreachBatch(_commit)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            f"{index.table.root}/_checkpoints/{checkpoint_name}",
        )
        .start()
    )
    deadline = time.time() + poll_timeout_s
    while q.isActive and time.time() < deadline:
        q.awaitTermination(1.0)
    if q.isActive:
        # a hung micro-batch must not turn the bound into forever:
        # stop the query and surface the timeout instead of falling
        # through to an unbounded awaitTermination
        q.stop()
        raise TimeoutError(
            f"streaming dedup ingest still active after "
            f"poll_timeout_s={poll_timeout_s}"
        )
    q.awaitTermination()  # re-raises any micro-batch exception
    return stats
