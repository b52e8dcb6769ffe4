"""KMV (k-minimum-values) distinct-count sketch — the mergeable
cardinality sketch for dashboard/maintenance rollups at 100 TB, built
on the engine's portable hash so the estimate is BIT-IDENTICAL across
engines (Spark's approx_count_distinct is HLL++ with an engine-private
hash — useful, but not oracle-checkable; KMV with the affine hash is).

Theory (Bar-Yossef et al. 2002): hash every value uniformly into
[0, P); keep the k smallest DISTINCT hashes per group. If fewer than k
distinct values exist the sketch IS the exact count; otherwise the
k-th smallest hash h_k estimates density and
``distinct ≈ (k−1) · P / h_k``. Integer floor-division keeps the
estimate exact-replayable (no float rounding between engines).

Scale: one shuffle of (group, hash) pairs — and the sketch is
MERGEABLE (union the min-k sets, re-take the min-k), so partial
sketches per partition/day/shard combine without re-scanning: the
property that makes sketch rollup tables work (`merge_kmv`).
Relative error ≈ 1/√(k−2) (~13% at k=64, ~4% at k=1024).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import SAMPLE_P, id_hash, id_hash_sql


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: (group_cols…, hashes array<long> — the ≤k
    smallest distinct hashes, ascending).

    Two-phase min-k (no global per-group sort): phase 1 keeps the min-k
    per (group, input-partition) — every cell's rows live in ONE map
    partition, so the set dedup happens map-side; phase 2 merges the
    partial min-k arrays, whose total size is bounded by
    k × #partitions per group instead of |distinct|. The old
    single-window form shuffled EVERY distinct hash of a group to one
    task — the exact skew hot-spot this removes (min-k of a union ==
    min-k of per-part min-k's, so results are bit-identical)."""
    minset = F.slice(F.array_sort(F.collect_set("_h")), 1, k)
    partial = (
        df.select(*group_cols, id_hash(F.col(value_col)).alias("_h"))
        .withColumn("_pid", F.spark_partition_id())
        .groupBy(*group_cols, "_pid")
        .agg(minset.alias("_ph"))
    )
    return (
        partial.select(*group_cols, F.explode("_ph").alias("_h"))
        .groupBy(*group_cols)
        .agg(minset.alias("hashes"))
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(group_cols…, distinct_est long): exact when |hashes| < k, else
    floor((k−1)·P / h_k) — pure integer arithmetic."""
    n = F.size("hashes")
    kth = F.element_at("hashes", k)
    est = F.when(n < k, n.cast("long")).otherwise(
        F.floor(F.lit((k - 1) * SAMPLE_P) / kth).cast("long")
    )
    return sketch.withColumn("distinct_est", est).drop("hashes")


def merge_kmv(a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge two sketch tables (outer on groups): union the hash sets,
    re-take the min-k — the rollup operation (day sketches → month
    sketch without touching rows)."""
    merged = (
        a.select(*group_cols, "hashes")
        .unionByName(b.select(*group_cols, "hashes"))
        .select(*group_cols, F.explode("hashes").alias("_h"))
    )
    # inputs are already ≤k per sketch row: one bounded set-agg, no
    # window/global sort needed (collect_set dedups shared hashes)
    return merged.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("hashes")
    )


def kmv_sql(group_expr: str, value_expr: str, table: str, k: int = 64) -> str:
    """The identical estimator in ANSI/DuckDB SQL (oracle generation)."""
    return f"""
    hashed AS (
      SELECT DISTINCT {group_expr} AS g,
             {id_hash_sql(value_expr)} AS h
      FROM {table}),
    ranked AS (
      SELECT g, h,
             row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM hashed),
    sk AS (
      SELECT g, count(*) AS n, max(h) AS kth
      FROM ranked WHERE rn <= {k} GROUP BY g),
    est AS (
      SELECT g,
             CASE WHEN n < {k} THEN n
                  ELSE CAST(floor(CAST({(k - 1) * SAMPLE_P} AS DOUBLE)
                                  / kth) AS BIGINT)
             END AS distinct_est
      FROM sk)
    """


# ---------------------------------------------------------------------------
# KMV set operations (Beyer et al. 2007): union & intersection estimates
# from two sketch tables — no re-scan of the raw rows. The k-min-values
# of A ∪ B are the min-k of the merged hash sets; the fraction of those
# that appear in BOTH sketches estimates the Jaccard index, and
# intersection ≈ jaccard · union. All integer arithmetic → bit-identical
# across engines.
# ---------------------------------------------------------------------------
def kmv_overlap(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Inner-join two sketch tables on group_cols and estimate
    (union_est, intersect_est) per group. Pure array Column ops —
    sketches are ≤k longs each, so this is metadata-scale compute no
    matter how big the sketched tables were."""
    ha, hb = F.col("_ha"), F.col("_hb")
    joined = a.select(*group_cols, F.col("hashes").alias("_ha")).join(
        b.select(*group_cols, F.col("hashes").alias("_hb")), group_cols
    )
    merged = F.slice(F.array_sort(F.array_union(ha, hb)), 1, k)
    n = F.size(merged)
    kth = F.element_at(merged, k)
    union_est = F.when(n < k, n.cast("long")).otherwise(
        F.floor(F.lit((k - 1) * SAMPLE_P) / kth).cast("long")
    )
    in_both = F.size(F.array_intersect(F.array_intersect(merged, ha), hb))
    # floor(in_both · union_est / n) in exact integer math
    inter_est = (in_both.cast("long") * union_est - F.pmod(
        in_both.cast("long") * union_est, n.cast("long")
    )) / n.cast("long")
    return joined.select(
        *group_cols,
        union_est.alias("union_est"),
        inter_est.cast("long").alias("intersect_est"),
    )


def kmv_overlap_sql(
    a_cte: str, b_cte: str, k: int = 64
) -> str:
    """The identical estimator over two (g, hashes) CTEs in DuckDB SQL
    (oracle generation; list ops mirror the Column ops 1:1)."""
    return f"""
    joined AS (
      SELECT a.g, a.hashes AS ha, b.hashes AS hb
      FROM {a_cte} a JOIN {b_cte} b USING (g)),
    m AS (
      SELECT g, ha, hb,
             list_sort(list_distinct(list_concat(ha, hb)))[1:{k}] AS L
      FROM joined),
    est AS (
      SELECT g,
             CASE WHEN len(L) < {k} THEN len(L)
                  ELSE CAST(floor(CAST({(k - 1) * SAMPLE_P} AS DOUBLE)
                                  / L[{k}]) AS BIGINT)
             END AS union_est,
             len(list_intersect(list_intersect(L, ha), hb)) AS in_both,
             len(L) AS n
      FROM m),
    overlap AS (
      SELECT g, union_est,
             (in_both * union_est) // n AS intersect_est
      FROM est)
    """


def kmv_hashes_sql(
    group_expr: str, value_expr: str, table: str, k: int, cte: str
) -> str:
    """(g, hashes) sketch CTE in DuckDB SQL — the list form kmv_sketch
    emits (ascending ≤k smallest distinct hashes)."""
    return f"""
    {cte}_h AS (
      SELECT DISTINCT {group_expr} AS g,
             {id_hash_sql(value_expr)} AS h
      FROM {table}),
    {cte}_r AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM {cte}_h),
    {cte} AS (
      SELECT g, list(h ORDER BY h) AS hashes
      FROM {cte}_r WHERE rn <= {k} GROUP BY g)
    """


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — sublinear frequency
# table: depth hash rows x width counters; estimate(v) = min over rows
# of counter[r][h_r(v)]. Overestimates only (collisions add, never
# subtract) — the heavy-hitter screen at 100 TB where an exact
# per-token groupBy would shuffle billions of keys. Counters are
# ADDITIVE across shards/partitions (merge = elementwise sum), and the
# portable double-hash family keeps estimates bit-identical to the
# DuckDB oracle.
# ---------------------------------------------------------------------------
_CM_A2, _CM_B2 = 214013, 2531011  # second LCG pair (shared w/ bloom.py)
_CM_SPOLY = 31


def _cm_hash_cols(c, is_string: bool):
    if is_string:
        h = F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(0))),
                lambda i: F.ascii(F.substring(c, i, 1)),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * _CM_SPOLY + x) % SAMPLE_P,
        )
    else:
        h = F.pmod(c.cast("long"), F.lit(SAMPLE_P))
    from .sampling import SAMPLE_A, SAMPLE_B

    h1 = (h * SAMPLE_A + SAMPLE_B) % SAMPLE_P
    h2 = (h * _CM_A2 + _CM_B2) % SAMPLE_P
    return h1, h2


def cm_sketch(
    df: DataFrame,
    value_col: str,
    width: int = 512,
    depth: int = 3,
    is_string: bool = True,
) -> DataFrame:
    """Build the counter table (r, b, cnt) in ONE aggregation:
    depth x width cells max — a few KB regardless of input size."""
    h1, h2 = _cm_hash_cols(F.col(value_col), is_string)
    return (
        df.select(h1.alias("_h1"), h2.alias("_h2"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
            "_h1",
            "_h2",
        )
        .select("r", F.pmod(F.col("_h1") + F.col("r") * F.col("_h2"),
                            F.lit(width)).alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    width: int = 512,
    depth: int = 3,
    is_string: bool = True,
) -> DataFrame:
    """Point-estimate each probe key: min over hash rows of its bucket
    counter. The sketch is ≤ depth·width rows → broadcast join."""
    h1, h2 = _cm_hash_cols(F.col(value_col), is_string)
    cells = (
        probes.select(value_col, h1.alias("_h1"), h2.alias("_h2"))
        .select(
            value_col,
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
            "_h1",
            "_h2",
        )
        .select(
            value_col,
            "r",
            F.pmod(F.col("_h1") + F.col("r") * F.col("_h2"),
                   F.lit(width)).alias("b"),
        )
    )
    return (
        cells.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_est"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two counter tables (same width/depth): elementwise sum —
    the shard-and-add property that makes count-min a rollup sketch."""
    return (
        a.unionByName(b).groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))
    )


def _cm_hash_sql(value_expr: str) -> tuple[str, str]:
    """(h1, h2) SQL expressions — char-polynomial fold then the two
    affine maps, mirroring _cm_hash_cols exactly."""
    from .sampling import SAMPLE_A, SAMPLE_B

    hh = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({value_expr}, ''), "
        f"x -> CAST(unicode(x) AS BIGINT))), "
        f"(acc, x) -> (acc * {_CM_SPOLY} + x) % {SAMPLE_P})"
    )
    return (
        f"({hh} * {SAMPLE_A} + {SAMPLE_B}) % {SAMPLE_P}",
        f"({hh} * {_CM_A2} + {_CM_B2}) % {SAMPLE_P}",
    )


def cm_sql(source_cte: str, width: int, depth: int) -> str:
    """Counter table + estimator in DuckDB SQL, mirroring
    cm_sketch/cm_lookup 1:1. Expects CTEs `{source_cte}_all` (column v:
    every occurrence) and `{source_cte}_probes` (column v: keys to
    estimate); emits `cm_counts` (r, b, cnt) and `cm_est` (v, cm_est)."""
    h1, h2 = _cm_hash_sql("v")
    p1, p2 = _cm_hash_sql("p.v")
    return f"""
    cm_h AS (
      SELECT {h1} AS h1, {h2} AS h2
      FROM {source_cte}_all),
    cm_counts AS (
      SELECT r, (h1 + r * h2) % {width} AS b, CAST(count(*) AS BIGINT) AS cnt
      FROM cm_h, unnest(range({depth})) AS t(r)
      GROUP BY 1, 2),
    cm_probe_cells AS (
      SELECT p.v, t.r,
             (({p1}) + t.r * ({p2})) % {width} AS b
      FROM {source_cte}_probes p, unnest(range({depth})) AS t(r)),
    cm_est AS (
      SELECT c.v, CAST(min(coalesce(k.cnt, 0)) AS BIGINT) AS cm_est
      FROM cm_probe_cells c LEFT JOIN cm_counts k USING (r, b)
      GROUP BY c.v)
    """


# ---------------------------------------------------------------------------
# Fixed-grid histogram sketch — the mergeable quantile structure: bin
# counters add across shards/days (like cm_merge), and any quantile is
# answerable from the counters alone. Equi-width bins trade adaptivity
# for DETERMINISM: no randomized compaction (t-digest/KLL), so the
# estimate is bit-identical across engines and oracle-checkable.
# ---------------------------------------------------------------------------
def hist_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """(group_cols…, b, cnt): per-group equi-width bin counts over
    [lo, hi); values outside clamp to the edge bins. ONE aggregation;
    at most bins cells per group."""
    raw = F.floor(
        (F.col(value_col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins)
    )
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    return (
        df.select(*group_cols, b.alias("b"))
        .groupBy(*group_cols, "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two histogram tables (same grid): elementwise add."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hist_quantile(
    sketch: DataFrame,
    group_cols: list[str],
    q: float,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Per-group quantile estimate from the counters: target rank
    t = ceil(q·n); inside the first bin whose cumulative count reaches
    t, interpolate linearly. Quantized to 6dp so the double arithmetic
    is order-independent and engine-portable.

    Returns (group_cols…, est) — alias `est` at the call site."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*group_cols)
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(W.partitionBy(*group_cols))
    )
    t = F.ceil(F.lit(q) * F.col("n"))
    hit = cum.filter(F.col("cum") >= t).withColumn(
        "_rn",
        F.row_number().over(
            W.partitionBy(*group_cols).orderBy("b")
        ),
    ).filter(F.col("_rn") == 1)
    est = F.lit(lo) + (
        F.col("b")
        + (t - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    ) * F.lit(hi - lo) / F.lit(bins)
    return hit.select(
        *group_cols,
        (F.floor(est * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("est"),
    )


def hist_quantile_sql(
    group_expr: str,
    value_expr: str,
    table: str,
    q: float,
    lo: float,
    hi: float,
    bins: int,
    cte: str,
) -> str:
    """The identical estimator in DuckDB SQL (emits CTE `{cte}` with
    (g, est)) — expression order mirrors hist_sketch/hist_quantile."""
    return f"""
    {cte}_bins AS (
      SELECT {group_expr} AS g,
             CAST(least(greatest(
               floor(({value_expr} - {lo}) / {hi - lo} * {bins}),
               0), {bins - 1}) AS INT) AS b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM {table} GROUP BY 1, 2),
    {cte}_cum AS (
      SELECT g, b, cnt,
             sum(cnt) OVER (PARTITION BY g ORDER BY b
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n
      FROM {cte}_bins),
    {cte}_hit AS (
      SELECT g, b, cnt, cum, n,
             row_number() OVER (PARTITION BY g ORDER BY b) AS _rn
      FROM {cte}_cum WHERE cum >= ceil({q} * n)),
    {cte} AS (
      SELECT g,
             floor(({lo} + (b + (ceil({q} * n) - (cum - cnt))
                            / cnt) * {hi - lo} / {bins})
                   * 1000000 + 0.5) / 1000000 AS est
      FROM {cte}_hit WHERE _rn = 1)
    """
