"""BigQuery-dialect shim — Column-level equivalents for every scalar
function family the reference's SQL surface uses (SURVEY.md §2.8
F1-F25), so its queries translate mechanically to Spark.

Everything stays a JVM-side Column expression (whole-stage codegen) —
including the geohash encoder, which unrolls the bit-interleaving loop
into a fixed expression tree instead of dropping to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- F4/F5
_UNIT_MICROS = {
    "MICROSECOND": 1,
    "MILLISECOND": 1_000,
    "SECOND": 1_000_000,
    "MINUTE": 60 * 1_000_000,
    "HOUR": 3600 * 1_000_000,
    "DAY": 86400 * 1_000_000,
}


def timestamp_diff(a: Column, b: Column, unit: str) -> Column:
    """BigQuery TIMESTAMP_DIFF(a, b, unit) = a − b (NB: Spark's
    timestampdiff takes (unit, start, end) — argument order flips,
    SURVEY.md F4).

    BigQuery truncates the MICROSECOND difference toward zero — NOT each
    timestamp to whole units first: diff('...02.000', '...00.900',
    SECOND) is 1, not 2. Computed exactly in long arithmetic:
    `diff - diff % u` is an exact multiple of u (Spark `%` keeps the
    dividend's sign, i.e. truncating semantics), so the final division
    is exact for any representable timestamp range."""
    unit = unit.upper()
    if unit not in _UNIT_MICROS:
        raise ValueError(f"unsupported unit {unit!r}")
    u = _UNIT_MICROS[unit]
    diff = F.unix_micros(a) - F.unix_micros(b)
    if u == 1:
        return diff
    return ((diff - diff % F.lit(u)) / F.lit(u)).cast("long")


def timestamp_sub(ts: Column, n: int, unit: str) -> Column:
    """TIMESTAMP_SUB(ts, INTERVAL n unit) (iceberg_maintenance.py:81)."""
    return ts - F.expr(f"INTERVAL {n} {unit}")


def timestamp_add(ts: Column, n: int, unit: str) -> Column:
    return ts + F.expr(f"INTERVAL {n} {unit}")


# ---------------------------------------------------------------- F7
def parse_bq_timestamp(col: Column) -> Column:
    """Parse the reference's canonical '%Y-%m-%d %H:%M:%S UTC' string
    (main.py:75-76) back to TimestampType."""
    return F.to_timestamp(
        F.regexp_replace(col, " UTC$", ""), "yyyy-MM-dd HH:mm:ss"
    )


def format_bq_timestamp(ts: Column) -> Column:
    """The inverse: TimestampType → 'YYYY-MM-DD HH:MM:SS UTC'."""
    return F.concat(F.date_format(ts, "yyyy-MM-dd HH:mm:ss"), F.lit(" UTC"))


# ---------------------------------------------------------------- A8/F25
def approx_quantiles(col: Column, n: int) -> Column:
    """APPROX_QUANTILES(x, n): n+1 quantile boundaries as an array;
    BigQuery's [OFFSET(k)] maps to element_at(arr, k+1) (F25)."""
    return F.percentile_approx(
        col, [i / n for i in range(n + 1)], F.lit(10000)
    )


def offset(arr: Column, k: int) -> Column:
    """BigQuery arr[OFFSET(k)] (0-based) → element_at (1-based)."""
    return F.element_at(arr, k + 1)


# ---------------------------------------------------------------- F17
def safe_divide(a: Column, b: Column) -> Column:
    """SAFE_DIVIDE / the NULLIF(x,0) pattern (PRD.md:5443-5444)."""
    return a / F.nullif(b, F.lit(0))


# ---------------------------------------------------------------- F21
def json_object(*pairs: tuple[str, Column]) -> Column:
    """JSON_OBJECT('k', v, ...) → to_json(struct(...)) (PRD.md:1058)."""
    return F.to_json(F.struct(*[v.alias(k) for k, v in pairs]))


# ---------------------------------------------------------------- F19
def generate_uuid() -> Column:
    """GENERATE_UUID() — nondeterministic, excluded from oracle hashes
    (SURVEY.md §2.13 determinism rules)."""
    return F.uuid()


# ---------------------------------------------------------------- F24
_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def st_geogpoint(lon: Column, lat: Column) -> Column:
    """ST_GEOGPOINT(lon, lat) → struct (no native geography type)."""
    return F.struct(
        lon.cast("double").alias("lon"), lat.cast("double").alias("lat")
    )


def st_geohash(point: Column, precision: int = 7) -> Column:
    """ST_GEOHASH(pt, p): standard geohash base-32 encoding as pure
    Column expressions. The interval-halving loop is equivalent to
    taking the binary expansion of the scaled coordinate —
    ``floor((lon+180)/360 · 2^n)`` — so the whole hash is two fixed-point
    scalings plus static bit extraction: O(5p) flat expressions, no
    nested conditionals. Published test vectors pinned in tests."""
    total_bits = 5 * precision
    n_lon = (total_bits + 1) // 2  # even positions (0,2,..) are lon bits
    n_lat = total_bits // 2
    lon_idx = F.least(
        F.floor((point["lon"] + 180.0) / 360.0 * (1 << n_lon)).cast("long"),
        F.lit((1 << n_lon) - 1),
    )
    lat_idx = F.least(
        F.floor((point["lat"] + 90.0) / 180.0 * (1 << n_lat)).cast("long"),
        F.lit((1 << n_lat) - 1),
    )
    bits: list[Column] = []
    for i in range(total_bits):
        if i % 2 == 0:
            j = i // 2  # j-th lon bit, MSB first
            bits.append(
                F.shiftright(lon_idx, n_lon - 1 - j).bitwiseAND(F.lit(1))
            )
        else:
            j = i // 2
            bits.append(
                F.shiftright(lat_idx, n_lat - 1 - j).bitwiseAND(F.lit(1))
            )
    chars = []
    for g in range(precision):
        idx = F.lit(0)
        for j in range(5):
            idx = idx + bits[g * 5 + j] * (2 ** (4 - j))
        chars.append(F.lit(_GEOHASH_ALPHABET).substr((idx + 1).cast("int"), F.lit(1)))
    return F.concat(*chars)


def geohash_of(lon: Column, lat: Column, precision: int = 7) -> Column:
    """Convenience: ST_GEOHASH(ST_GEOGPOINT(lon, lat), p)
    (the generated-column pattern, PRD.md:1074-1079)."""
    return st_geohash(st_geogpoint(lon, lat), precision)
