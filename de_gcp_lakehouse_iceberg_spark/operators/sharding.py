"""Deterministic global shuffle + shard export — the last stage of a
training-data pipeline: every corpus build ends with "shuffle the
documents reproducibly and write N equal-ish shards" so data loaders
stream without seeking and epochs are reproducible across reruns.

Determinism: shard assignment and within-shard order both derive from
the portable affine id hash (operators/sampling.py) — pure row-local
expressions, so the layout is identical across runs, partitionings,
and engines (the q71 oracle re-derives it from the same constants).
`DataFrame.repartition` + `rand()` would give neither.

Scale: ONE shuffle, keyed on the shard id (uniform by construction —
the hash is uniform on [0, P)), then a within-partition sort; no
global sort, no driver involvement. At 100 TB pick n_shards ≈
corpus_bytes / target_shard_bytes and the shuffle stays balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .sampling import id_hash


def shuffle_shard(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every row a shard (hash mod n_shards) and its position
    within the shard's deterministic order (hash asc, id asc — the
    "global shuffle" order). Adds columns `shard` and `pos`."""
    h = id_hash(id_col)
    out = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % F.lit(n_shards)).cast("long")
    )
    w = W.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop(
        "_h"
    )


def write_shards(
    df: DataFrame, path: str, n_shards: int, id_col: str = "doc_id"
) -> None:
    """Materialize the shuffled corpus as one directory per shard with
    rows in shuffle order (parquet preserves within-file row order).
    Readers stream shard files sequentially — no shuffle at load time."""
    sharded = shuffle_shard(df, n_shards, id_col)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def write_webdataset(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    meta_cols: list[str] | None = None,
    payload_col: str | None = None,
    payload_ext: str = "bin",
) -> list[str]:
    """Export the deterministically-shuffled corpus as WebDataset-style
    tar shards — the sequential-read delivery format multimodal
    training loaders consume (one `shard-NNNNN.tar` per shard; each
    sample contributes `<key>.txt` for text, `<key>.json` for metadata,
    and optionally `<key>.<payload_ext>` for a binary column).

    Layout and order are fully deterministic: shard membership and
    within-shard position come from `shuffle_shard`'s portable hash, so
    re-exporting an identical corpus yields byte-stable member ORDER
    and names (tar timestamps are pinned to epoch 0). Each shard is
    written by exactly ONE task (mapInPandas over shard-partitioned
    rows — no driver data), so at 100 TB this is n_shards parallel
    sequential writers; pick n_shards ≈ corpus_bytes / shard_bytes.

    Returns the shard file paths. Pure stdlib (tarfile) — no codecs:
    payloads are written verbatim, matching the engine's opaque-binary
    multimodal column policy."""
    import json as _json
    import os

    os.makedirs(path, exist_ok=True)
    keep = [id_col] + ([text_col] if text_col else [])
    keep += list(meta_cols or [])
    if payload_col:
        keep.append(payload_col)
    sharded = (
        shuffle_shard(df.select(*keep), n_shards, id_col)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
    )

    def write_tars(batches):
        import io
        import tarfile

        import pandas as pd

        tars: dict[int, tarfile.TarFile] = {}

        def member(tf, name, data: bytes):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0  # pinned: byte-stable re-exports
            tf.addfile(info, io.BytesIO(data))

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                shard = int(d["shard"])
                tf = tars.get(shard)
                if tf is None:
                    tf = tarfile.open(
                        os.path.join(path, f"shard-{shard:05d}.tar"), "w"
                    )
                    tars[shard] = tf
                key = f"{d[id_col]:012d}" if isinstance(
                    d[id_col], int
                ) else str(d[id_col])
                if text_col:
                    member(
                        tf, f"{key}.txt", str(d[text_col]).encode("utf-8")
                    )
                meta = {c: d[c] for c in (meta_cols or [])}
                meta["__pos__"] = int(d["pos"])
                member(
                    tf,
                    f"{key}.json",
                    _json.dumps(meta, sort_keys=True, default=str).encode(),
                )
                if payload_col and d[payload_col] is not None:
                    member(
                        tf, f"{key}.{payload_ext}", bytes(d[payload_col])
                    )
            yield pd.DataFrame({"shard": []})
        for tf in tars.values():
            tf.close()

    # the empty-yield mapInPandas drives the per-partition writers
    sharded.mapInPandas(write_tars, "shard long").count()
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".tar")
    )
