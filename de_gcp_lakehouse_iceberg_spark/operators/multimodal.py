"""Multimodal column handling — image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched Pandas
functions (SURVEY.md §7.1 step 10).

The decode step is STUBBED (this container has no image/audio codecs):
`decode_stub=True` derives deterministic fake features from the bytes
themselves, and the real-codec path raises NotImplementedError with the
integration point documented. Everything AROUND the decode — schema,
binary packing, partition-parallel mapInPandas plumbing, batch shapes,
feature schema — is real and tested.

Scale posture: binary payloads ride in the same parquet row groups as
their metadata (no side files to keep consistent); mapInPandas streams
Arrow record batches per partition, so peak memory is one batch of
payloads, not one partition; feature extraction is embarrassingly
parallel with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_bytes:bigint>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, "
    "byte_mean double, byte_entropy double, head_hash bigint"
)


def pack_media(
    df: DataFrame,
    id_col: str,
    payload_col: Column,
    kind: str,
    width: Column | None = None,
    height: Column | None = None,
    sample_rate: Column | None = None,
) -> DataFrame:
    """Normalize arbitrary rows into the opaque-binary media shape."""
    null_i = F.lit(None).cast("int")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload_col.cast("binary").alias("payload"),
        F.struct(
            (width if width is not None else null_i).alias("width"),
            (height if height is not None else null_i).alias("height"),
            (sample_rate if sample_rate is not None else null_i).alias(
                "sample_rate"
            ),
            F.octet_length(payload_col.cast("binary"))
            .cast("long")
            .alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, kind: str):
    """REAL decode integration point — wire an image/audio codec here
    (PIL / torchaudio / ffmpeg). Not available in this container."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "run extract_features(decode_stub=True) for the deterministic "
        "byte-level fake, or plug a codec into decode_media()"
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Per-payload feature extraction over mapInPandas (Arrow batches).

    Stub features are pure functions of the payload bytes — byte mean,
    byte entropy, and a 64-bit FNV-1a hash of the first 64 bytes — so
    tests are deterministic and the plumbing (batch iteration, schema,
    null payloads) is exercised for real.
    """

    def _batches(it: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in it:
            out = {
                "media_id": [],
                "kind": [],
                "n_bytes": [],
                "byte_mean": [],
                "byte_entropy": [],
                "head_hash": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:
                    continue
                if not decode_stub:
                    decode_media(bytes(payload), kind)  # raises: no codecs
                b = bytes(payload)
                n = len(b)
                counts: dict[int, int] = {}
                total = 0
                for x in b:
                    counts[x] = counts.get(x, 0) + 1
                    total += x
                # entropy terms accumulate in byte-value order: a fixed
                # fold order makes the double bit-identical to the q42
                # DuckDB oracle's list_sum(list(... ORDER BY b))
                ent = (
                    -sum(
                        (c / n) * math.log2(c / n)
                        for _bv, c in sorted(counts.items())
                    )
                    if n
                    else 0.0
                )
                h = 0xCBF29CE484222325
                for x in b[:64]:
                    h = ((h ^ x) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(n)
                out["byte_mean"].append(total / n if n else 0.0)
                out["byte_entropy"].append(ent)
                out["head_hash"].append(h - 2**63)  # signed long
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches, schema=FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, frame_bytes: int = 16
) -> DataFrame:
    """Frame-sampling analog for video-ish payloads: slice the payload
    at fixed strides (pure Column ops — substr on binary stays JVM-side).
    Output: (media_id, frame_no, frame bytes)."""
    n_frames = (F.octet_length("payload") / every_n_bytes).cast("int")
    return (
        media.select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))))
            .alias("frame_no"),
            "payload",
        )
        .select(
            "media_id",
            "frame_no",
            F.expr(
                f"substring(payload, frame_no * {every_n_bytes} + 1, {frame_bytes})"
            ).alias("frame"),
        )
    )
