"""Skew-aware aggregation — salted two-phase groupBy for heavy-hitter
keys (SURVEY.md §7.3 item 9: extension operators at 100 TB need
salt-aware partitioning).

Spark's map-side partial aggregation already absorbs most group-by
skew; what it can NOT absorb is a high-cardinality-payload aggregate
(collect_list/collect_set/exact distinct) on a key where one value owns
a large share of all rows — every row of the hot key lands on one
reducer. Salting splits each key into `salt` sub-keys (uniform via
pmod(hash(full row), salt)), aggregates partially per sub-key, then
re-aggregates the (now tiny) per-salt partials.

AQE's skew-join splitting handles the JOIN side of the same problem;
this handles the AGGREGATE side. Combinable aggregates only (sum,
count, min, max — anything with an associative merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    `aggs` maps output column name → (partial_agg_expr, merge_agg_expr)
    where partial runs per (keys, salt-bucket) and merge combines the
    per-salt partials, e.g.:

        salted_agg(df, ["k"], {
            "cnt":   (F.count("*"),      F.sum("cnt")),
            "total": (F.sum("v"),        F.sum("total")),
            "mx":    (F.max("v"),        F.max("mx")),
        })

    Result is identical to ``df.groupBy(keys).agg(...)`` for any
    associative aggregate; the shuffle fan-in per reducer shrinks by
    the salt factor for hot keys.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _merge) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_partial, merge) in aggs.items()]
    )
