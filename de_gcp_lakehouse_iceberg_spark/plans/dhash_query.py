"""q92 — perceptual-hash (dHash) image dedup under the driver hash
gate, tying the multimodal and dedup families together.

Scenario: every 4 consecutive doc_ids share one synthetic base image
(gid = doc_id // 4; base byte offset is a Knuth-multiplicative mix of
gid so unrelated groups don't alias); each of the 4 variants adds a
small per-pixel jitter — planted near-duplicates with known pixel
math. The Spark side runs the REAL pipeline: raw_rgb payload
generation → `dhash_media` (integer-grayscale 8x7 gradient hash,
mapInPandas) → `dhash_near_pairs` (14-bit Hamming bands → popcount
verify). The DuckDB oracle never touches a payload: it recomputes
every sampled gray value from index arithmetic, folds the same 56-bit
hash, replays the same banding (including false-positive candidates),
and must land the identical per-distance pair histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    DHASH_H,
    DHASH_W,
    MEDIA_SCHEMA,
    dhash_media,
    dhash_near_pairs,
)
from ..tables import table
from .queries import register

_MIX = 2654435761          # Knuth multiplicative constant
_P31 = 2147483647
_BANDS = 4
_MAXD = 6
_GW = DHASH_W + 1          # sampled grid columns (9)

# integer pixel formula shared (as text) by generator and oracle:
#   w = 16 + gid % 5, h = 12 + gid % 4, gid = doc_id // 4
#   t(px)  = (gid·MIX + px·MIX2) % P31          px = idx // 3
#   v(idx) = (t·t % P31) % 240                  base image
#            + (idx · (doc_id % 4)) % 7         variant jitter
# The SQUARE of the mixed term is essential: a linear congruential
# base is an arithmetic progression whose wrap-around step pattern is
# shared across groups (translation-invariant gradients ⇒ massive
# cross-group dHash aliasing — measured: 454 distinct hashes over
# 2000 docs). Squaring scatters the residues; measured 0 cross-group
# collisions over sf0.1's 5000 docs, leaving exactly the 7500 planted
# within-group pairs. t < 2³¹ so t² < 2⁶² — int64-exact in both
# engines.
_MIX2 = 1013904223
_SQL_W = "(16 + (d.doc_id // 4) % 5)"
_SQL_H = "(12 + (d.doc_id // 4) % 4)"


def _sql_v(idx: str) -> str:
    t = f"(((d.doc_id // 4) * {_MIX} + (({idx}) // 3) * {_MIX2}) % {_P31})"
    return (
        f"((({t} * {t}) % {_P31}) % 240"
        f" + (({idx}) * (d.doc_id % 4)) % 7)"
    )


def _media(docs: DataFrame) -> DataFrame:
    """Synthesize the planted near-duplicate raw_rgb images."""

    def _gen(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for d in pdf["doc_id"]:
                d = int(d)
                gid = d // 4
                w, h = 16 + gid % 5, 12 + gid % 4
                idx = np.arange(w * h * 3, dtype=np.int64)
                t = (gid * _MIX + (idx // 3) * _MIX2) % _P31
                v = ((t * t) % _P31) % 240 + (idx * (d % 4)) % 7
                out["media_id"].append(d)
                out["kind"].append("raw_rgb")
                out["payload"].append(v.astype(np.uint8).tobytes())
                out["meta"].append(
                    {"width": w, "height": h, "sample_rate": None,
                     "n_bytes": w * h * 3}
                )
            if out["media_id"]:
                yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(_gen, schema=MEDIA_SCHEMA)


_BW = (DHASH_W * DHASH_H) // _BANDS
_BMASK = (1 << _BW) - 1


_SQL_B0 = (
    f"(3 * (((gy.gy * {_SQL_H}) // {DHASH_H}) * {_SQL_W}"
    f" + ((gx.gx * {_SQL_W}) // {_GW})))"
)


@register(
    "q92_dhash_image_dedup",
    oracle=f"""
    WITH gray AS (
      SELECT d.doc_id, gy.gy, gx.gx,
             ({_sql_v(_SQL_B0)} + {_sql_v(f"{_SQL_B0} + 1")}
              + {_sql_v(f"{_SQL_B0} + 2")}) // 3 AS gv
      FROM documents d,
           unnest(range({DHASH_H})) AS gy(gy),
           unnest(range({_GW})) AS gx(gx)),
    dh AS (
      SELECT a.doc_id,
             CAST(coalesce(sum(CASE WHEN a.gv > c.gv
               THEN (CAST(1 AS BIGINT) << (a.gy * {DHASH_W} + a.gx))
               ELSE 0 END), 0) AS BIGINT) AS dhash
      FROM gray a
      JOIN gray c ON a.doc_id = c.doc_id AND a.gy = c.gy
                 AND c.gx = a.gx + 1
      WHERE a.gx < {DHASH_W}
      GROUP BY a.doc_id),
    banded AS (
      SELECT doc_id, dhash, j.j,
             (dhash >> (j.j * {_BW})) & {_BMASK} AS bv
      FROM dh, unnest(range({_BANDS})) AS j(j)),
    cand AS (
      SELECT DISTINCT a.doc_id AS ma, b.doc_id AS mb,
             a.dhash AS ha, b.dhash AS hb
      FROM banded a JOIN banded b
        ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id),
    pairs AS (
      SELECT ma, mb, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS distance
      FROM cand WHERE bit_count(xor(ha, hb)) <= {_MAXD})
    SELECT distance,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT ma) AS BIGINT) AS n_left,
           CAST(min(ma) AS BIGINT) AS min_a,
           CAST(max(mb) AS BIGINT) AS max_b
    FROM pairs
    GROUP BY distance
    ORDER BY distance
    """,
)
def q92_dhash_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sigs = dhash_media(_media(docs))
    pairs = dhash_near_pairs(sigs, bands=_BANDS, max_distance=_MAXD)
    return (
        pairs.groupBy("distance")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("media_a").alias("n_left"),
            F.min("media_a").alias("min_a"),
            F.max("media_b").alias("max_b"),
        )
        .orderBy("distance")
    )
