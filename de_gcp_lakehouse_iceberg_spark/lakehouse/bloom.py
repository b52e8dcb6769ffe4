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


def _positions_py(value, bits: int, k: int) -> list[int]:
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
        h = c.cast("long") % _P
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
        buf[p // 8] |= 1 << (p % 8)
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

    pos_cols = [
        positions_col(
            F.col(c), schema[c] == "string", bits, k
        ).alias(f"_pos_{c}")
        for c in columns
    ]
    exploded = df.select(F.col(FILE_COL).alias("_file"), *pos_cols)
    per_file: dict[str, dict[str, list[int]]] = {}
    for c in columns:
        rows = (
            exploded.select("_file", F.explode(f"_pos_{c}").alias("p"))
            .distinct()
            .groupBy("_file")
            .agg(F.collect_set("p").alias("ps"))
            .collect()
        )
        for r in rows:
            per_file.setdefault(r["_file"], {})[c] = r["ps"]

    from .dml import _rel_paths

    rel_per_file = {
        _rel_paths(table, [abs_path])[0]: v
        for abs_path, v in per_file.items()
    }
    new_files = []
    for f in snap.files:
        e = FileEntry.from_json(f.to_json())
        blooms = {
            c: {"bits": bits, "k": k, "b64": _bitset_to_b64(ps, bits)}
            for c, ps in rel_per_file.get(f.path, {}).items()
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
