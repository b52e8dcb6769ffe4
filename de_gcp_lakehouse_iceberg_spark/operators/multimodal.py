"""Multimodal column handling — image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched Pandas
functions (SURVEY.md §7.1 step 10).

The decode step parses real container headers in pure Python (PNG
IHDR / JPEG SOF / GIF screen descriptor → format, width, height);
unrecognized payloads are treated as opaque bytes with null
dimensions. Pixel/audio-frame decode remains the documented
integration point for a real codec library (none installed in this
container). Everything around it — schema, binary packing,
partition-parallel mapInPandas plumbing, batch shapes, byte-level
features — is real and tested, and q42 hash-gates the header parser
against planted PNG/JPEG payloads with known dimensions.

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
    "byte_mean double, byte_entropy double, head_hash bigint, "
    "format string, width int, height int"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers carrying dimensions (C0-CF minus
# DHT C4 / JPG C8 / DAC CC, per ITU T.81 table B.1)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


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


def decode_media(payload: bytes, kind: str | None = None) -> dict:
    """Header-level decode for public image container formats — pure
    Python over the documented byte layouts (PNG IHDR, JPEG SOF
    markers per ITU T.81, GIF logical screen descriptor). Returns
    {"format", "width", "height"}; raises ValueError for payloads that
    are not a recognized container (callers treat that as
    "opaque bytes" and carry null dimensions).

    Deeper decode (pixel data, audio frames) is the integration point
    for a real codec (PIL / torchaudio / ffmpeg — not installed in
    this container); header parsing needs no codec and covers the
    metadata a curation pipeline filters on (resolution gates,
    aspect-ratio buckets)."""
    b = payload
    if len(b) >= 24 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        return {
            "format": "png",
            "width": int.from_bytes(b[16:20], "big"),
            "height": int.from_bytes(b[20:24], "big"),
        }
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:
                break
            if marker in _JPEG_SOF:
                if i + 9 <= len(b):
                    return {
                        "format": "jpeg",
                        "height": int.from_bytes(b[i + 5 : i + 7], "big"),
                        "width": int.from_bytes(b[i + 7 : i + 9], "big"),
                    }
                break
            i += 2 + seg_len
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return {
            "format": "gif",
            "width": int.from_bytes(b[6:8], "little"),
            "height": int.from_bytes(b[8:10], "little"),
        }
    raise ValueError(
        "unrecognized media payload (header decode supports PNG/JPEG/GIF)"
    )


def extract_features(media: DataFrame, decode_stub: bool = False) -> DataFrame:
    """Per-payload feature extraction over mapInPandas (Arrow batches).

    Byte-level features are pure functions of the payload bytes — byte
    mean, byte entropy, and a 64-bit FNV-1a hash of the first 64 bytes
    — deterministic in any engine. With decode_stub=False (default)
    the real header decode also runs: recognized PNG/JPEG/GIF payloads
    carry (format, width, height); anything else is opaque bytes with
    null dimensions. decode_stub=True skips the decode entirely (the
    byte-only mode earlier rounds gated)."""

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
                "format": [],
                "width": [],
                "height": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:
                    continue
                fmt = width = height = None
                if not decode_stub:
                    try:
                        d = decode_media(bytes(payload), kind)
                        fmt, width, height = d["format"], d["width"], d["height"]
                    except ValueError:
                        pass  # opaque bytes — dims stay null
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
                out["format"].append(fmt)
                out["width"].append(width)
                out["height"].append(height)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches, schema=FEATURE_SCHEMA
    )


def resize_media(
    media: DataFrame,
    out_w: int,
    out_h: int,
    on_unsupported: str = "error",
) -> DataFrame:
    """Nearest-neighbor image resize over mapInPandas (Arrow batches).

    REAL resample for uncompressed `raw_rgb` payloads (H x W x 3
    uint8, row-major — the shape a decode stage emits): output pixel
    (x, y) copies source pixel (x·W_in//W_out, y·H_in//H_out), the
    textbook nearest-neighbor gather, vectorized with one numpy fancy
    index per payload. Deterministic bytes → oracle-checkable (q81).

    Compressed containers (png/jpeg/gif/...) need a pixel codec — NOT
    installed in this container — so they are the documented stub:
    `on_unsupported="error"` raises NotImplementedError naming the
    integration point; "skip" drops those rows; "passthrough" forwards
    them unchanged. The Spark-side plumbing (schema, Arrow batch shape,
    partition parallelism, meta rewrite) is identical either way.

    Scale: embarrassingly parallel, zero shuffle; peak memory is one
    Arrow batch of payloads per core."""
    if on_unsupported not in ("error", "skip", "passthrough"):
        raise ValueError(f"bad on_unsupported {on_unsupported!r}")

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                w_in = meta.get("width") if meta is not None else None
                h_in = meta.get("height") if meta is not None else None
                supported = (
                    kind == "raw_rgb"
                    and payload is not None
                    and w_in and h_in
                    and len(payload) == w_in * h_in * 3
                )
                if not supported:
                    if on_unsupported == "error":
                        raise NotImplementedError(
                            f"resize of kind={kind!r} needs a pixel codec "
                            "(PIL/ffmpeg — integration point; this "
                            "container has none). Decode to raw_rgb "
                            "first, or pass on_unsupported='skip'."
                        )
                    if on_unsupported == "skip":
                        continue
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["payload"].append(payload)
                    out["meta"].append(meta)
                    continue
                img = np.frombuffer(bytes(payload), dtype=np.uint8).reshape(
                    h_in, w_in, 3
                )
                ys = (np.arange(out_h) * h_in) // out_h
                xs = (np.arange(out_w) * w_in) // out_w
                resized = img[ys][:, xs]
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["payload"].append(resized.tobytes())
                out["meta"].append(
                    {
                        "width": out_w,
                        "height": out_h,
                        "sample_rate": meta.get("sample_rate"),
                        "n_bytes": out_w * out_h * 3,
                    }
                )
            if out["media_id"]:
                # an all-skipped batch would yield object columns pyarrow
                # cannot map to the struct schema — yield nothing instead
                yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        _batches, schema=MEDIA_SCHEMA
    )


def pcm_resample(
    media: DataFrame, to_rate: int, on_unsupported: str = "error"
) -> DataFrame:
    """Audio resample over mapInPandas: REAL linear interpolation for
    uncompressed `pcm16` payloads (mono int16 little-endian at
    meta.sample_rate). Output sample t (t = 0 .. ceil(n·to/from)−1)
    interpolates source position t·from/to — numpy interp, vectorized.
    Compressed audio (mp3/ogg/...) is the codec stub, same policy knob
    as resize_media."""
    if on_unsupported not in ("error", "skip", "passthrough"):
        raise ValueError(f"bad on_unsupported {on_unsupported!r}")

    def _batches(it: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                rate = meta.get("sample_rate") if meta is not None else None
                supported = (
                    kind == "pcm16"
                    and payload is not None
                    and rate
                    and len(payload) % 2 == 0
                )
                if not supported:
                    if on_unsupported == "error":
                        raise NotImplementedError(
                            f"resample of kind={kind!r} needs an audio "
                            "codec (integration point; none installed). "
                            "Decode to pcm16 first, or pass "
                            "on_unsupported='skip'."
                        )
                    if on_unsupported == "skip":
                        continue
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["payload"].append(payload)
                    out["meta"].append(meta)
                    continue
                x = np.frombuffer(bytes(payload), dtype="<i2").astype(
                    np.float64
                )
                n = len(x)
                m = max(1, math.ceil(n * to_rate / rate)) if n else 0
                if n:
                    pos = np.arange(m) * (rate / to_rate)
                    y = np.interp(pos, np.arange(n), x)
                    resampled = np.clip(np.rint(y), -32768, 32767).astype(
                        "<i2"
                    )
                    pay = resampled.tobytes()
                else:
                    pay = b""
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["payload"].append(pay)
                out["meta"].append(
                    {
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "sample_rate": to_rate,
                        "n_bytes": len(pay),
                    }
                )
            if out["media_id"]:
                # an all-skipped batch would yield object columns pyarrow
                # cannot map to the struct schema — yield nothing instead
                yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        _batches, schema=MEDIA_SCHEMA
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


# -- perceptual image hashing (dHash) --------------------------------------
# 56-bit difference hash: 8 horizontal gradient signs x 7 rows over an
# integer-grayscale nearest-neighbor downsample. Everything is integer
# arithmetic (gray = (r+g+b)//3, the same floor-division index gather
# resize_media uses), so the hash is bit-identical across engines and
# the q92 oracle recomputes it from raw pixel formulas. 56 < 63 bits
# keeps the value positive in a signed long — band extraction below
# never touches the sign bit.
DHASH_W = 8   # bits per row (samples W+1 columns)
DHASH_H = 7   # rows


def dhash_long(payload: bytes, width: int, height: int) -> int:
    """Reference (single-image) dHash — the spec the vectorized batch
    path and the SQL oracle both match bit-for-bit."""
    import numpy as np

    img = np.frombuffer(payload, dtype=np.uint8).reshape(height, width, 3)
    gray = img.astype(np.int64).sum(axis=2) // 3
    ys = (np.arange(DHASH_H) * height) // DHASH_H
    xs = (np.arange(DHASH_W + 1) * width) // (DHASH_W + 1)
    g = gray[ys][:, xs]  # (DHASH_H, DHASH_W+1)
    bits = g[:, :-1] > g[:, 1:]  # horizontal gradient signs
    h = 0
    for y in range(DHASH_H):
        for x in range(DHASH_W):
            if bits[y, x]:
                h |= 1 << (y * DHASH_W + x)
    return h


def dhash_media(media: DataFrame, on_unsupported: str = "error") -> DataFrame:
    """(media_id, dhash) for raw_rgb payloads via mapInPandas — the
    perceptual fingerprint feeding `dhash_near_pairs`. Compressed
    containers follow the same codec-stub policy as resize_media
    ("error" | "skip"). Zero shuffle; one numpy gather per image."""
    if on_unsupported not in ("error", "skip"):
        raise ValueError(f"bad on_unsupported {on_unsupported!r}")

    def _batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, hashes = [], []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                w = meta.get("width") if meta is not None else None
                h = meta.get("height") if meta is not None else None
                ok = (
                    kind == "raw_rgb" and payload is not None
                    and w and h and len(payload) == w * h * 3
                )
                if not ok:
                    if on_unsupported == "error":
                        raise NotImplementedError(
                            f"dhash of kind={kind!r} needs a pixel codec "
                            "(integration point) — decode to raw_rgb first "
                            "or pass on_unsupported='skip'."
                        )
                    continue
                ids.append(mid)
                hashes.append(dhash_long(bytes(payload), int(w), int(h)))
            if ids:
                yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        _batches, schema="media_id bigint, dhash bigint"
    )


def dhash_near_pairs(
    sigs: DataFrame, bands: int = 4, max_distance: int = 6
) -> DataFrame:
    """Hamming-banded near-duplicate image pairs from dHash signatures:
    the 56 bits split into `bands` contiguous bands; images sharing ANY
    band value become candidates (guaranteed recall for distance <
    bands; probabilistic above — standard LSH tradeoff), then the exact
    popcount(xor) verify keeps pairs with distance ≤ max_distance.

    Scale: the self-join is on (band_id, band_value) buckets — no
    all-pairs; bucket skew only arises from genuinely identical image
    regions, which ARE the duplicates being hunted."""
    total_bits = DHASH_W * DHASH_H
    if total_bits % bands:
        raise ValueError("bands must divide the 56 signature bits")
    bw = total_bits // bands
    mask = (1 << bw) - 1
    banded = sigs.select(
        F.col("media_id"),
        F.col("dhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band_id"),
                    F.shiftright(F.col("dhash"), j * bw)
                    .bitwiseAND(F.lit(mask))
                    .alias("band_val"),
                )
                for j in range(bands)
            ])
        ).alias("b"),
    ).select("media_id", "dhash", "b.band_id", "b.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select(
        "media_a", "media_b", dist.cast("long").alias("distance")
    ).filter(F.col("distance") <= max_distance)
