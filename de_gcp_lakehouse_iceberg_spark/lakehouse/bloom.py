"""Per-file Bloom filters for equality file-skipping — the Iceberg /
Parquet bloom-filter capability for columns where [min, max] stats
cannot prune (high-cardinality ids interleaved across files: every
file's range covers the probe, yet almost none contain it; at 100 TB
an id-equality lookup without blooms reads the whole table).

Build is a MAINTENANCE pass (`add_bloom_filters`, the
`rewrite_table_path`-style post-write job): ONE distributed scan
computes each live file's bit positions — rows never reach the driver,
only ≤ m distinct positions per file do (the bitset, ~bits/8 bytes per
file in the manifest). The manifest commit is metadata-only.

Probing is driver-side pure arithmetic: the SAME double-hash family
(Kirsch–Mitzenmacher: idx_i = (h1 + i·h2) mod m) evaluated in Python
for the literal, checked against each file's bitset during
`plan_files`. Hashes are the engine's portable affine/polynomial
families (operators/sampling.py constants; char-polynomial for
strings) — pure expressions on both sides, no engine-private hash.

False positives only ⇒ a kept file is re-filtered by the exact row
predicate; a pruned file PROVABLY lacks the value (no false
negatives: every row's positions were OR-ed in).
"""

from __future__ import annotations

import base64
import functools as _functools

from pyspark.sql import Column
from pyspark.sql import functions as F

from .table import FILE_COL, FileEntry, LakeTable, Snapshot

_P = 2147483647          # 2^31 - 1 (shared with operators/sampling.py)
_A1, _B1 = 1103515245, 12345
_A2, _B2 = 214013, 2531011
_SPOLY = 31              # string polynomial base (mod P)

DEFAULT_BITS = 4096
DEFAULT_K = 5


# -- portable double-hash: Python side (plan-time probe) -------------------
def _h_int_py(v: int) -> tuple[int, int]:
    v = int(v) % _P
    return (v * _A1 + _B1) % _P, (v * _A2 + _B2) % _P


def _h_str_py(s: str) -> tuple[int, int]:
    # codepoint fold (matches Spark's per-char F.ascii exactly)
    h = 0
    for ch in s:
        h = (h * _SPOLY + ord(ch)) % _P
    return (h * _A1 + _B1) % _P, (h * _A2 + _B2) % _P


@_functools.lru_cache(maxsize=1 << 17)
def _positions_py(value, bits: int, k: int) -> list[int]:
    # cached: a join-driven "in" probe re-checks the SAME key set
    # against every file's bloom — positions depend only on
    # (value, bits, k), so hash once per key, not once per (key, file)
    if isinstance(value, str):
        h1, h2 = _h_str_py(value)
    else:
        h1, h2 = _h_int_py(value)
    return [(h1 + i * h2) % bits for i in range(k)]


# -- portable double-hash: Spark side (build pass) -------------------------
def _h_col(c: Column, is_string: bool) -> tuple[Column, Column]:
    if is_string:
        # codepoint-polynomial fold mod P — matches _h_str_py exactly
        # (aggregate fold is sequential; F.ascii = codepoint per char)
        h = F.aggregate(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.length(c), F.lit(0))
                ),
                lambda i: F.ascii(F.substring(c, i, 1)),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * _SPOLY + x) % _P,
        )
    else:
        # pmod, not %: SQL % follows the dividend's sign, so a negative
        # key would hash negative here while the Python plan-time probe
        # (_h_int_py) uses Python %, which is always non-negative — the
        # mismatch produced bloom FALSE NEGATIVES (pruning files that
        # contain the value). pmod matches Python % exactly.
        h = F.pmod(c.cast("long"), F.lit(_P))
    return (h * _A1 + _B1) % _P, (h * _A2 + _B2) % _P


def positions_col(c: Column, is_string: bool, bits: int, k: int) -> Column:
    h1, h2 = _h_col(c, is_string)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (h1 + i * h2) % bits,
    )


def _bitset_to_b64(positions: list[int], bits: int) -> str:
    buf = bytearray(bits // 8)
    for p in positions:
        if not 0 <= p < bits:
            # a negative/oversized position would silently corrupt the
            # bitset via Python negative indexing — that failure mode
            # shipped once (SQL % vs Python % on negative keys); fail
            # loudly instead.
            raise ValueError(f"bloom position {p} out of range [0, {bits})")
        buf[p // 8] |= 1 << (p % 8)
    return base64.b64encode(bytes(buf)).decode("ascii")


def _words_to_b64(words: list[tuple[int, int]], bits: int) -> str:
    """Assemble the bitset from (word_index, int64 word) pairs — the
    distributed build's per-file aggregate. Word w covers bit positions
    [64w, 64w+64) with `1 << (p - 64w)`; little-endian packing makes the
    byte layout IDENTICAL to _bitset_to_b64's `buf[p//8] |= 1<<(p%8)`."""
    import struct

    buf = bytearray(bits // 8)
    n_words = bits // 64
    for w, word in words:
        if not 0 <= w < n_words:
            raise ValueError(f"bloom word {w} out of range [0, {n_words})")
        struct.pack_into("<q", buf, w * 8, word)
    return base64.b64encode(bytes(buf)).decode("ascii")


def _b64_has(b64: str, pos: int) -> bool:
    raw = base64.b64decode(b64)
    return bool(raw[pos // 8] & (1 << (pos % 8)))


def add_bloom_filters(
    table: LakeTable,
    columns: list[str],
    bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> Snapshot:
    """Compute per-file blooms for `columns` over the CURRENT snapshot
    in one distributed pass and commit them into the manifest
    (metadata-only; file set unchanged). Size m for the expected rows
    per file: FPR ≈ (1 − e^(−k·n/m))^k — the 4096/5 default gives
    ~3% at 500 distinct values/file."""
    snap = table.snapshot()
    if not snap.files:
        return snap
    # with_file_col: resolves the provenance column on the raw file
    # relation, so the build also works under pending MOR deletes
    # (bits are computed for LIVE rows only — correct: a pruned file
    # provably lacks the live value)
    df = table._read_files(
        snap, [f.path for f in snap.files], with_file_col=True
    )
    schema = {
        f.name: f.dataType.simpleString()
        for f in df.schema.fields
        if f.name != FILE_COL
    }
    for col in columns:
        if col not in schema:
            raise ValueError(f"no column {col!r}")
        if schema[col] not in ("string", "bigint", "long", "int", "smallint"):
            raise ValueError(
                f"bloom on {col!r}: only integer/string columns "
                f"(got {schema[col]})"
            )

    if bits % 64:
        raise ValueError(f"bits must be a multiple of 64 (got {bits})")

    # ONE distributed pass for ALL columns: stack (column, positions)
    # per row, explode to (file, column, position), then fold positions
    # into int64 bitset WORDS with bit_or — the full bitset aggregation
    # happens executor-side (partial aggregation before the exchange).
    # The driver receives at most files x columns x (bits/64) tiny rows
    # (words actually hit), NOT the old files x 4096 position sets —
    # at 10^6 files this is what keeps the build driver-light.
    stacked = (
        df.select(
            F.col(FILE_COL).alias("_file"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("c"),
                        positions_col(
                            F.col(c), schema[c] == "string", bits, k
                        ).alias("ps"),
                    )
                    for c in columns
                ])
            ).alias("e"),
        )
        .select("_file", F.col("e.c").alias("c"), F.explode("e.ps").alias("p"))
    )
    word_rows = (
        stacked
        .withColumn("w", (F.col("p") / 64).cast("int"))
        # F.shiftleft only takes a literal shift — SQL's accepts a column
        .withColumn("m", F.expr("shiftleft(1L, p % 64)"))
        .groupBy("_file", "c", "w")
        .agg(F.bit_or("m").alias("word"))
        .groupBy("_file", "c")
        .agg(F.collect_list(F.struct("w", "word")).alias("words"))
        .collect()
    )
    per_file: dict[str, dict[str, list]] = {}
    for r in word_rows:
        per_file.setdefault(r["_file"], {})[r["c"]] = [
            (x["w"], x["word"]) for x in r["words"]
        ]

    from .dml import _rel_paths

    rel_per_file = {
        _rel_paths(table, [abs_path])[0]: v
        for abs_path, v in per_file.items()
    }
    new_files = []
    for f in snap.files:
        e = FileEntry.from_json(f.to_json())
        blooms = {
            c: {"bits": bits, "k": k, "b64": _words_to_b64(ws, bits)}
            for c, ws in rel_per_file.get(f.path, {}).items()
        }
        if blooms:
            e.stats = dict(e.stats, _blooms=blooms)  # rides the stats dict
        new_files.append(e)
    return table._commit_snapshot(
        operation="add_bloom_filters",
        files=new_files,
        schema_json=snap.schema_json,
        base=snap.version,
        summary={"bloom_columns": columns, "bits": bits, "k": k},
    )


def bloom_may_contain(entry: FileEntry, col: str, value) -> bool:
    """Plan-time probe: False ⇒ the file provably lacks `value`.
    Files without a bloom for `col` are always kept."""
    blooms = entry.stats.get("_blooms") if entry.stats else None
    if not blooms or col not in blooms:
        return True
    b = blooms[col]
    return all(
        _b64_has(b["b64"], p)
        for p in _positions_py(value, b["bits"], b["k"])
    )
