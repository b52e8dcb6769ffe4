"""Incremental view maintenance (delta IVM) — a maintained COUNT/SUM
group-by rollup updated from the base table's CHANGELOG, never by
re-scanning the base.

`views.create_materialized_view` already refreshes partition-
incrementally (recompute only changed partitions); this module covers
the complementary case: an UNPARTITIONED (or cross-partition) rollup
under arbitrary DML. COUNT and SUM are abelian-group aggregates, so
the row-level change feed (`dml.changelog` — INSERT/DELETE rows, with
UPDATE emitted as a DELETE+INSERT pair) maps directly to deltas:
+1/−1 per count, ±value per sum. Applying deltas touches

  O(changelog rows) + O(affected groups),

independent of base-table size — at 100 TB a thousand-row commit
refreshes the dashboard rollup in milliseconds, where a recompute
would scan everything. Sums are stored as DECIMAL so delta application
is EXACT and order-independent (float sums would drift under repeated
± application and break parity with a from-scratch recompute — the
invariant tests/test_ivm.py pins).

Freshness bookkeeping follows the MV layer: the rollup table's
snapshot summary records `source_version`; refresh reads the
changelog from there to the base head and commits the new rollup
with the advanced version in ONE atomic snapshot.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dml
from .table import LakeTable

_CONFIG = "ivm.json"
_DEC = "decimal(28,6)"


class IncrementalRollup:
    """A LakeTable holding (group_cols..., cnt, sum_<c>...) maintained
    by changelog deltas."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        with open(os.path.join(self.root, _CONFIG)) as f:
            cfg = json.load(f)
        self.base_root: str = cfg["base_root"]
        self.group_cols: list[str] = cfg["group_cols"]
        self.sum_cols: list[str] = cfg["sum_cols"]
        self.table = LakeTable.load(spark, self.root)

    # -- lifecycle -----------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        base: LakeTable,
        group_cols: list[str],
        sum_cols: list[str],
    ) -> "IncrementalRollup":
        root = os.path.abspath(root)
        LakeTable.create(spark, root)
        cfg = {
            "base_root": base.root,
            "group_cols": group_cols,
            "sum_cols": sum_cols,
        }
        tmp = os.path.join(root, _CONFIG + ".tmp")
        with open(tmp, "w") as f:
            json.dump(cfg, f)
        os.replace(tmp, os.path.join(root, _CONFIG))
        rollup = cls(spark, root)
        src_v = base.current_version()
        rollup.table.overwrite(
            rollup._full_compute(base),
            operation="ivm_bootstrap",
            summary={"source_version": src_v},
        )
        return rollup

    def _full_compute(self, base: LakeTable) -> DataFrame:
        return (
            base.scan()
            .groupBy(*self.group_cols)
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(F.col(c).cast(_DEC)).alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
        )

    # -- refresh -------------------------------------------------------
    def refresh(self) -> dict:
        """Apply the base's changelog since the last refresh. Returns
        {"mode": "noop"|"delta", "delta_rows": n, "source_version": v}.
        Never scans the base table."""
        base = LakeTable.load(self.spark, self.base_root)
        last = self.table.snapshot().summary["source_version"]
        cur = base.current_version()
        if cur == last:
            return {"mode": "noop", "delta_rows": 0, "source_version": cur}
        ch = dml.changelog(base, last, cur)
        delta_rows = ch.count()
        sign = F.when(F.col("_change_type") == "INSERT", F.lit(1)).otherwise(
            F.lit(-1)
        )
        deltas = ch.groupBy(*self.group_cols).agg(
            F.sum(sign).alias("_d_cnt"),
            *[
                F.sum(sign.cast(_DEC) * F.col(c).cast(_DEC))
                .cast(_DEC)
                .alias(f"_d_sum_{c}")
                for c in self.sum_cols
            ],
        )
        old = self.table.scan()
        merged = (
            old.join(deltas, self.group_cols, "full_outer")
            .select(
                *self.group_cols,
                (
                    F.coalesce(F.col("cnt"), F.lit(0))
                    + F.coalesce(F.col("_d_cnt"), F.lit(0))
                ).alias("cnt"),
                *[
                    (
                        F.coalesce(F.col(f"sum_{c}"), F.lit(0).cast(_DEC))
                        + F.coalesce(
                            F.col(f"_d_sum_{c}"), F.lit(0).cast(_DEC)
                        )
                    )
                    .cast(_DEC)
                    .alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
            .filter(F.col("cnt") > 0)  # groups net-deleted drop out
        )
        self.table.overwrite(
            merged,
            operation="ivm_delta_refresh",
            summary={"source_version": cur, "delta_rows": delta_rows},
        )
        return {
            "mode": "delta",
            "delta_rows": delta_rows,
            "source_version": cur,
        }

    def df(self) -> DataFrame:
        return self.table.scan()
