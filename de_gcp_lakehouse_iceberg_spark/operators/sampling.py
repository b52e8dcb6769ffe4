"""Deterministic sampling & data-mixing operators for training-data
pipelines — the "mix sources at fixed weights" and "downsample a
stratum" primitives every corpus build needs (SURVEY.md §7.1 step 10
extension surface).

Everything is keyed on a PORTABLE affine id hash h(id) = (id·A + B)
mod P (constants below, P = 2³¹−1): membership is a pure row-local
predicate, so sampling is a scan-time filter (no shuffle, pushes below
joins), reproducible across engines (the DuckDB oracles re-derive it
from the same constants), and stable across runs/partitionings — unlike
`DataFrame.sample`, whose output depends on partition layout. At 100 TB
the filter rides the parquet scan; nothing else moves.

Rates are materialized as INTEGER thresholds `int(rate · P)` at plan
time — the engines compare longs, never floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

SAMPLE_P = 2147483647  # 2^31 - 1 (Mersenne)
SAMPLE_A = 1103515245  # classic LCG multiplier, < P
SAMPLE_B = 12345


def id_hash(id_col: Column | str) -> Column:
    """Portable uniform hash of an integer id into [0, P)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        (c.cast("long") % SAMPLE_P) * F.lit(SAMPLE_A) + F.lit(SAMPLE_B)
    ) % F.lit(SAMPLE_P)


def id_hash_sql(id_expr: str) -> str:
    """The identical hash in ANSI/DuckDB SQL (oracle generation)."""
    return (
        f"((CAST({id_expr} AS BIGINT) % {SAMPLE_P}) * {SAMPLE_A} "
        f"+ {SAMPLE_B}) % {SAMPLE_P}"
    )


def threshold(rate: float) -> int:
    """rate ∈ [0,1] → integer hash threshold (computed once in Python,
    embedded as a literal in both the Spark plan and the oracle SQL)."""
    return int(rate * SAMPLE_P)


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~rate of rows, deterministically by id."""
    return df.filter(id_hash(id_col) < F.lit(threshold(rate)))


def sample_by_weights(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Data mixing: per-group keep rates (e.g. upweight books, cap web).
    One CASE over integer thresholds — a scan-time filter."""
    thresh = F.lit(threshold(default_rate))
    for k, rate in sorted(weights.items()):
        thresh = F.when(F.col(key_col) == k, F.lit(threshold(rate))).otherwise(
            thresh
        )
    return df.filter(id_hash(id_col) < thresh)


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash order
    (deterministic, unbiased); ties broken by id. Two-phase grouped
    top-k, not a row_number window: each input partition keeps only
    its n best per stratum map-side, so a skewed stratum never funnels
    ALL its rows into one sort task — the selection shuffles at most
    n × #partitions rows per stratum."""
    from .topk import grouped_topk

    return grouped_topk(
        df,
        [stratum_col],
        [id_hash(id_col), F.col(id_col)],
        n_per_stratum,
        # fat payload (document text) never crosses Arrow / the shuffle:
        # only (stratum, hash, id) enter the partial; winners broadcast
        # back — valid because id_hash is deterministic
        payload="rejoin",
    ).select(*df.columns)


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened source mixing — the published multilingual
    sampling rule (sample source s ∝ n_s^α, α<1 upweights small
    sources). Realized as per-source deterministic keep rates
    r_s = (n_min/n_s)^(1-α), so the smallest source keeps everything
    and larger sources flatten toward it.

    Determinism: α=0.5 evaluates the rate with sqrt — IEEE-754 requires
    sqrt correctly rounded, so Spark and any SQL oracle produce the
    bit-identical threshold. Other α use pow(), which engines do NOT
    guarantee to the last ulp — fine for production, not hash-gated.

    Shape: one count aggregate (rows = #sources), a global window min
    over it, then a broadcast join + scan-time hash filter — nothing
    corpus-sized shuffles.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("_n"))
    counts = counts.withColumn(
        "_nmin", F.min("_n").over(W.partitionBy())
    )
    ratio = F.col("_nmin").cast("double") / F.col("_n")
    rate = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    th = counts.select(
        key_col,
        F.floor(rate * F.lit(SAMPLE_P) + F.lit(0.5)).cast("long").alias("_th"),
    )
    return (
        df.join(F.broadcast(th), key_col)
        .filter(id_hash(id_col) < F.col("_th"))
        .drop("_th")
    )


def split_assign(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test split — every corpus build's last
    labeling step. Each row gets a `split` label by carving [0, P) into
    contiguous hash ranges proportional to `weights` (default
    80/10/10). Row-local and engine-portable like every sampler here:
    no shuffle, stable under repartitioning, disjoint and exhaustive by
    construction (the ranges partition [0, P)), and a row's split
    never changes when other rows come or go — the property that keeps
    eval sets leak-free across corpus versions."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    h = id_hash(id_col)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, wt in items[:-1]:
        acc += wt / total
        cond = h < F.lit(threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_assign_sql(
    weights: dict[str, float] | None = None, id_expr: str = "doc_id"
) -> str:
    """The identical CASE in ANSI/DuckDB SQL (oracle generation)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    h = id_hash_sql(id_expr)
    acc = 0.0
    branches = []
    items = sorted(weights.items())
    for name, wt in items[:-1]:
        acc += wt / total
        branches.append(f"WHEN {h} < {threshold(acc)} THEN '{name}'")
    return (
        "CASE " + " ".join(branches) + f" ELSE '{items[-1][0]}' END"
    )
