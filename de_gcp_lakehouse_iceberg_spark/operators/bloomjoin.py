"""Bloom semi-join — pre-filter a huge probe side with a broadcast
Bloom filter of the small side's keys BEFORE the exact join.

At 100 TB the expensive part of `big ⋉ small` is shuffling (or even
scanning+hashing) every big-side row; a Bloom filter of the small
side's keys is a few KB–MB that drops the vast majority of non-matching
rows AT THE SCAN, keeping the exact join's input tiny. This is the
hand-rolled form of Spark's runtime row-group filtering, built on the
engine's portable double-hash family (lakehouse/bloom.py) so behavior
is deterministic and oracle-checkable: Bloom filters have NO false
negatives, so `bloom_semi_join(big, small, key) == big ⋉ small`
exactly — false positives are removed by the exact join that follows.

Build: ONE aggregation over the small side folds bit positions into
int64 bitset words (bit_or, partial agg map-side); the driver collects
only bits/64 longs. Probe: a pure Column expression over a broadcast
array literal — no UDF, no extra shuffle, evaluated inside the scan
stage (codegen'd higher-order forall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lakehouse.bloom import positions_col

DEFAULT_BITS = 1 << 16  # 64 Kbit = 8 KB; ~1% FPR at ~5k distinct keys
DEFAULT_K = 5
# auto-sizing cap: 1 Mbit = 16384-long literal (~128 KB in the plan) —
# past this the literal-array probe is the wrong tool (docstring of
# bloom_probe_filter); use manifest-level blooms or a real join
MAX_AUTO_BITS = 1 << 20


def auto_bits(n_keys: int) -> int:
    """Filter size for ~1% FPR at k=5: ~10 bits/key (FPR ≈
    (1−e^(−k·n/m))^k ≈ 0.009 at m/n=10), rounded up to a power of two,
    floored at DEFAULT_BITS and capped at MAX_AUTO_BITS."""
    bits = DEFAULT_BITS
    while bits < 10 * max(n_keys, 1) and bits < MAX_AUTO_BITS:
        bits <<= 1
    return bits


def bloom_filter_words(
    small: DataFrame, key: str, bits: int = DEFAULT_BITS, k: int = DEFAULT_K
) -> list[int]:
    """Distributed build of the bitset: explode each key's k positions,
    fold into int64 words with bit_or, collect bits/64 longs."""
    if bits % 64:
        raise ValueError(f"bits must be a multiple of 64 (got {bits})")
    is_string = dict(small.dtypes)[key] == "string"
    # NULL keys never match an equi-join — and would otherwise ride
    # through as NULL positions/words and crash the bitset fold
    small = small.filter(F.col(key).isNotNull())
    rows = (
        small.select(
            F.explode(
                positions_col(F.col(key), is_string, bits, k)
            ).alias("p")
        )
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, p % 64)").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .collect()
    )
    words = [0] * (bits // 64)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_probe_filter(
    big: DataFrame,
    key: str,
    words: list[int],
    bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
    arrow: bool = True,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (no false
    negatives).

    Numeric keys take an Arrow fast path by default: the k positions
    and the bit tests run as a handful of whole-column numpy ops per
    batch (integer math identical to the expression form — same
    portable double-hash family, numpy %/pmod agree for a positive
    modulus), with the bitset captured in the UDF closure instead of
    riding the plan as a literal. The expression form (`arrow=False`,
    and the string-key path) is the cross-engine anchor — it is an
    interpreted higher-order `forall` per row, which is both ~10× the
    per-row cost and sensitive to executor memory pressure late in a
    long session (measured: q84's probe 2-3 s in isolation but ~27 s
    after 83 corpus queries at sf3; the Arrow path is flat in both).
    Either path feeds the exact semi-join that removes false
    positives, so results are identical. NULL keys are dropped by
    both (the expression's forall is NULL ⇒ filtered)."""
    is_string = dict(big.dtypes)[key] == "string"
    if arrow and not is_string:
        from pyspark.sql.functions import pandas_udf

        from ..lakehouse.bloom import _A1, _A2, _B1, _B2, _P

        warr = np.array(words, dtype=np.int64)

        @pandas_udf("boolean")
        def hit(s: pd.Series, na_s: pd.Series) -> pd.Series:
            # `s` is coalesce(key, 0) — NULL-free by construction, so
            # Arrow→pandas keeps it int64. Letting NULLs through would
            # promote the whole batch to float64 and silently round
            # |key| > 2^53 BEFORE we could recover it, hashing a
            # different value than the build side ⇒ bloom false
            # negatives. The real NULLs ride the separate boolean flag.
            na = na_s.to_numpy(dtype=bool)
            v = s.to_numpy(dtype=np.int64)
            h = np.mod(v, _P)  # == pmod: non-negative for positive P
            h1 = (h * _A1 + _B1) % _P  # h < 2^31, A1 < 2^31 → < 2^62
            h2 = (h * _A2 + _B2) % _P
            ok = np.ones(len(v), dtype=bool)
            for i in range(k):
                p = (h1 + i * h2) % bits
                # arithmetic >> keeps bit (p%64) intact; & 1 isolates it
                ok &= ((warr[p // 64] >> (p % 64)) & 1).astype(bool)
            ok[na] = False  # NULL key ⇒ filtered (matches forall path)
            return pd.Series(ok)

        kc = F.col(key).cast("long")
        return big.filter(
            hit(F.coalesce(kc, F.lit(0).cast("long")), kc.isNull())
        )
    probed = big.withColumn(
        "_bf_ps", positions_col(F.col(key), is_string, bits, k)
    ).withColumn("_bf_w", F.lit(words))
    kept = probed.filter(
        F.expr(
            "forall(_bf_ps, p -> "
            "(shiftright(element_at(_bf_w, cast(p / 64 as int) + 1), "
            "cast(p % 64 as int)) & 1L) = 1L)"
        )
    )
    return kept.drop("_bf_ps", "_bf_w")


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    bits: int | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """`big ⋉ small` on `key`, with the big side Bloom-pre-filtered.
    Result is EXACTLY the semi-join (the left_semi pass removes Bloom
    false positives); the win is that the shuffle/broadcast join runs
    on the pre-filtered remnant instead of the full big side.

    `bits=None` AUTO-SIZES the filter from the small side's key count
    (~10 bits/key → ~1% FPR, capped at MAX_AUTO_BITS): a fixed 64 Kbit
    filter degraded to 9% FPR once the dim side reached ~12k keys
    (measured at the sf3 fixture), silently inflating the exact-join
    input 4.5× — the auto size keeps the pass-through rate flat as the
    dim grows. The extra count() is one aggregate over the SMALL side."""
    if bits is None:
        bits = auto_bits(small.select(key).distinct().count())
    words = bloom_filter_words(small, key, bits, k)
    pre = bloom_probe_filter(big, key, words, bits, k)
    return pre.join(small.select(key).distinct(), key, "left_semi")
