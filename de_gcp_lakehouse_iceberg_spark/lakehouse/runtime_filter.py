"""Join-driven file skipping — the runtime-filter / semi-join pushdown
the reference gets from BigQuery for free (PRD.md:829-844 star joins;
PRD.md:127 FR-008 predicate pushdown), re-expressed at the manifest
layer: harvest the join keys from the (already filtered) dimension
side, then prune FACT FILES whose stats + blooms + partition
transforms prove none of those keys can be present — all before Spark
plans the scan.

At 100 TB this is the difference between "scan the fact table and let
the join drop 99.9%" and "never read the files that cannot match": the
dimension side of a selective star join typically yields 10²-10⁵ keys
(bounded by `max_keys` — harvesting is a driver-side collect and MUST
stay metadata-scale), while the fact side is the 100 TB. A per-file
bloom probe of 10⁴ keys is ~10⁵ integer ops per file — microseconds
against the seconds saved per pruned file.

The exact row-level filter (`col IN keys`) is still applied to the
surviving files by `LakeTable.scan`, so false-positive files cost I/O,
never correctness.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from .table import LakeTable

DEFAULT_MAX_KEYS = 100_000


def harvest_keys(
    dim: DataFrame, key_col: str, max_keys: int = DEFAULT_MAX_KEYS
) -> list[Any]:
    """Collect the DISTINCT join keys of a dimension-side query —
    bounded: raises if the key set exceeds `max_keys` (an unbounded
    harvest would mean the "dimension" is fact-sized and a shuffled
    join, not a runtime filter, is the right plan). NULL keys are
    dropped (they cannot equi-join)."""
    rows = (
        dim.select(key_col)
        .filter(dim[key_col].isNotNull())
        .distinct()
        .limit(max_keys + 1)
        .collect()
    )
    if len(rows) > max_keys:
        raise ValueError(
            f"dimension side yields more than max_keys={max_keys} distinct "
            f"{key_col!r} keys — use a plain join instead of a runtime filter"
        )
    return sorted(r[0] for r in rows)


def scan_with_join_filter(
    fact: LakeTable,
    fact_col: str,
    dim: DataFrame,
    dim_col: str | None = None,
    max_keys: int = DEFAULT_MAX_KEYS,
) -> tuple[DataFrame, dict[str, int]]:
    """Plan + read the fact table under a dimension-driven key filter.

    Returns (df, info): `df` is the fact rows whose `fact_col` is in
    the harvested key set, read from ONLY the files that survive
    stats/bloom/partition pruning per key; `info` reports
    {files_total, files_planned, n_keys} so callers (and the q91
    pruning proof) can assert the skip actually happened."""
    import os

    keys = harvest_keys(dim, dim_col or fact_col, max_keys)
    where = [(fact_col, "in", keys)]
    # Plan ONCE. When the snapshot carries a columnar manifest sidecar
    # (≥ PARQUET_MANIFEST_MIN files), pruning runs as a Spark job —
    # sorted-key range intersection + bloom probes per manifest batch on
    # executors, so a 10⁶-file × 10⁵-key plan never loops on the
    # driver. plan_files_distributed falls back to the driver loop for
    # small snapshots; results are identical by construction (same
    # per-entry `_file_survives`).
    snap0 = fact.snapshot()
    if os.path.exists(fact._parquet_manifest_path(snap0.version)):
        snap, planned = fact.plan_files_distributed(
            version=snap0.version, where=where
        )
    else:
        snap, planned = fact.plan_files(
            version=snap0.version, where=where
        )
    # Row-group refinement: surviving files whose manifest entries
    # carry per-row-group stats are narrowed to the groups the key set
    # can actually touch (the `in` op binary-searches each group's
    # [min,max] — same decision as file level, finer floor on bytes
    # read). Delete-free snapshots only; the sorted-key candidates
    # machinery makes each group's check O(log keys + keys-in-range).
    from .table import _normalize_where, _rg_survives

    rg_total = rg_read = 0
    plans: list = []
    preds = _normalize_where(where)
    if not snap.deletes:
        for f in planned:
            if f.rg_stats is None:
                plans.append((f, None))
                rg_total += 1
                rg_read += 1
                continue
            idx = [
                i
                for i, st in enumerate(f.rg_stats)
                if _rg_survives(st, preds)
            ]
            rg_total += len(f.rg_stats)
            rg_read += len(idx)
            if idx:
                plans.append((f, idx))
    if not snap.deletes and rg_read < rg_total:
        df = fact._apply_exact_where(
            fact._read_planned_row_groups(snap, plans), where
        )
    else:
        df = fact._apply_exact_where(
            fact._read_files(snap, [f.path for f in planned]), where
        )
    return df, {
        "files_total": len(snap0.files),
        "files_planned": len(planned),
        "n_keys": len(keys),
        "rowgroups_total": rg_total,
        "rowgroups_read": rg_read,
    }
