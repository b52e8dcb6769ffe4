"""Multimodal plumbing: binary pack/meta round-trip, deterministic stub
features through real Arrow batches, frame sampling, and the
NotImplementedError gate on the real-codec path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.operators import multimodal


def _media(spark):
    df = spark.createDataFrame(
        [(1, b"abcabc"), (2, b"\x00" * 10), (3, None)],
        "id long, data binary",
    )
    return multimodal.pack_media(
        df, id_col="id", payload_col=F.col("data"), kind="image",
        width=F.lit(8), height=F.lit(8),
    )


def test_pack_media_meta(spark):
    rows = {r.media_id: r for r in _media(spark).collect()}
    assert rows[1].meta.n_bytes == 6
    assert rows[2].meta.n_bytes == 10
    assert rows[3].meta.n_bytes is None  # null payload → null length
    assert rows[1].meta.width == 8 and rows[1].kind == "image"
    assert bytes(rows[1].payload) == b"abcabc"


def test_stub_features_deterministic(spark):
    feats = {r.media_id: r for r in
             multimodal.extract_features(_media(spark)).collect()}
    # null payload skipped
    assert set(feats) == {1, 2}
    r1 = feats[1]
    assert r1.n_bytes == 6
    assert abs(r1.byte_mean - (ord("a") + ord("b") + ord("c")) / 3) < 1e-12
    assert abs(r1.byte_entropy - math.log2(3)) < 1e-12  # 3 equally-likely bytes
    r2 = feats[2]
    assert r2.byte_entropy == 0.0 and r2.byte_mean == 0.0
    # FNV-1a of b"abcabc" head, recomputed independently
    h = 0xCBF29CE484222325
    for x in b"abcabc":
        h = ((h ^ x) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    assert r1.head_hash == h - 2**63


def test_real_decode_path_is_gated(spark):
    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(_media(spark), decode_stub=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, bytes(range(100)) * 30)], "id long, data binary")
    media = multimodal.pack_media(df, "id", F.col("data"), "video")
    frames = multimodal.sample_frames(media, every_n_bytes=1024, frame_bytes=16).collect()
    # 3000 bytes → 2 full strides
    assert [r.frame_no for r in frames] == [0, 1]
    assert bytes(frames[0].frame) == bytes(range(16))
    assert len(bytes(frames[1].frame)) == 16
