"""Maintenance CLI — the Spark engine's counterpart of the reference's
maintenance entry point (src/maintenance/iceberg_maintenance.py:411-449:
argparse → action dispatch → JSON report; schedules at :390-408).

    python -m de_gcp_lakehouse_iceberg_spark.maintenance_cli \
        --warehouse /path/to/wh --action full --table taxi_trips

Actions (M1-M10 in SURVEY.md §2.11):
  compact    — bin-pack small files (M1)
  expire     — expire old snapshots (M2)
  optimize   — sort-order rewrite (M3)
  cleanup    — orphan file removal, honors --dry-run (M4)
  stats      — table + column statistics (M5/M7)
  health     — partition health recommendations (M6)
  mv-refresh — refresh stale materialized views (D8)
  full       — stats → compact → sort → expire → orphans → health (M9)
  schedule   — long-running loop: hourly compact, daily 02:00 full,
               weekly Sun 01:00 optimize (M10), MV staleness sweep
  tag        — pin a named snapshot ref (--tag-name [--version])
  rollback   — revert to an earlier snapshot (--version)
  refs       — list tags + staged WAP ids
  history    — the commit log (version/operation/summary)
  wap-publish / wap-discard — publish or abandon a staged commit (--wap-id)
  bloom      — build per-file bloom filters (--bloom-columns a,b)
  cdc-export — export new commits to the streaming changelog feed
  delete-mor — merge-on-read DELETE (--predicate), metadata-only commit
  materialize-deletes — compaction pass applying pending MOR deletes
  rewrite-manifests — snapshot-log compaction (headers archived)
  clone      — snapshot-clone into a new table (--clone-to
               [--version | --tag-name]; BigQuery CREATE SNAPSHOT TABLE)
  ivm-create / ivm-refresh — maintain a changelog-delta COUNT/SUM
               rollup (--rollup-root, --group-cols a,b [--sum-cols x])
  ivm-join-create — maintain a rollup over fact ⋈ dim (--dim-table,
               --join-keys k; refresh via the same ivm-refresh)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark():
    from .session import get_spark

    return get_spark("maintenance")


def _table(spark, warehouse: str, name: str):
    from .lakehouse import LakeTable

    import os

    return LakeTable.load(spark, os.path.join(warehouse, name))


def run_action(args: argparse.Namespace) -> dict:
    from .lakehouse import Warehouse, maintenance

    spark = _spark()
    if args.action == "mv-refresh":
        wh = Warehouse(spark, args.warehouse)
        stale = wh.stale_materialized_views()
        for name in stale:
            wh.refresh_materialized_view(name)
        return {"action": "mv-refresh", "refreshed": stale}

    t = _table(spark, args.warehouse, args.table)
    if args.action == "compact":
        return maintenance.compact(t, target_file_size=args.target_file_size_mb * 1024 * 1024)
    if args.action == "expire":
        return maintenance.expire_snapshots(t, retention_days=args.retention_days)
    if args.action == "rewrite-manifests":
        return maintenance.rewrite_manifests(
            t, retention_days=args.retention_days
        )
    if args.action == "optimize":
        if args.zorder_columns:
            return maintenance.rewrite_zorder(
                t, args.zorder_columns.split(",")
            )
        sort_cols = args.sort_columns.split(",") if args.sort_columns else []
        if not sort_cols:
            return {"status": "skipped", "reason": "no --sort-columns given"}
        return maintenance.rewrite_sorted(t, sort_cols)
    if args.action == "cleanup":
        return maintenance.cleanup_orphans(
            t, older_than_days=args.orphan_age_days, dry_run=args.dry_run
        )
    if args.action == "stats":
        return maintenance.collect_statistics(t)
    if args.action == "health":
        return {"recommendations": maintenance.analyze_partitions(t)}
    if args.action == "tag":
        if not args.tag_name:
            raise ValueError("--tag-name required")
        v = t.set_tag(args.tag_name, args.version)
        return {"action": "tag", "name": args.tag_name, "version": v}
    if args.action == "rollback":
        if args.version is None:
            raise ValueError("--version required")
        snap = t.rollback_to(args.version)
        return {"action": "rollback", "new_version": snap.version,
                "rolled_back_to": args.version}
    if args.action == "refs":
        return {"tags": t.tags(), "staged": t.staged_ids()}
    if args.action == "history":
        return {"history": [r.asDict() for r in t.history_df().collect()]}
    if args.action == "wap-publish":
        if not args.wap_id:
            raise ValueError("--wap-id required")
        snap = t.publish(args.wap_id)
        return {"action": "wap-publish", "version": snap.version,
                "summary": snap.summary}
    if args.action == "wap-discard":
        if not args.wap_id:
            raise ValueError("--wap-id required")
        t.discard_staged(args.wap_id)
        return {"action": "wap-discard", "wap_id": args.wap_id}
    if args.action == "bloom":
        from .lakehouse.bloom import add_bloom_filters

        cols = [c for c in args.bloom_columns.split(",") if c]
        if not cols:
            raise ValueError("--bloom-columns required")
        snap = add_bloom_filters(t, cols)
        return {"action": "bloom", "version": snap.version,
                "columns": cols}
    if args.action == "cdc-export":
        from .streaming.cdc_stream import export_changelog

        n = export_changelog(t)
        return {"action": "cdc-export", "exported_versions": n}
    if args.action == "delete-mor":
        from .lakehouse.dml import delete_mor

        if not args.predicate:
            raise ValueError("--predicate required")
        snap = delete_mor(t, args.predicate)
        return {"action": "delete-mor", "version": snap.version,
                "predicate": args.predicate}
    if args.action == "materialize-deletes":
        from .lakehouse.dml import materialize_deletes

        snap = materialize_deletes(t)
        return {"action": "materialize-deletes", "version": snap.version,
                "remaining_deletes": len(t.snapshot().deletes)}
    if args.action == "clone":
        from .lakehouse.clone import clone_table

        if not args.clone_to:
            raise ValueError("--clone-to required")
        dst = clone_table(
            t, args.clone_to,
            version=args.version,
            tag=args.tag_name or None,
        )
        return {"action": "clone", "dest": dst.root,
                **dst.snapshot().summary}
    if args.action == "ivm-create":
        from .lakehouse.ivm import IncrementalRollup

        if not (args.rollup_root and args.group_cols):
            raise ValueError("--rollup-root and --group-cols required")
        rollup = IncrementalRollup.create(
            spark,
            args.rollup_root,
            t,
            group_cols=args.group_cols.split(","),
            sum_cols=[c for c in args.sum_cols.split(",") if c],
        )
        return {"action": "ivm-create", "rollup_root": rollup.root,
                "rows": rollup.df().count(),
                "source_version": t.current_version()}
    if args.action == "ivm-join-create":
        from .lakehouse.ivm import JoinRollup

        if not (args.rollup_root and args.group_cols and args.dim_table
                and args.join_keys):
            raise ValueError(
                "--rollup-root, --group-cols, --dim-table and "
                "--join-keys required"
            )
        dim = _table(spark, args.warehouse, args.dim_table)
        rollup = JoinRollup.create_join(
            spark,
            args.rollup_root,
            t,
            dim,
            join_keys=args.join_keys.split(","),
            group_cols=args.group_cols.split(","),
            sum_cols=[c for c in args.sum_cols.split(",") if c],
        )
        return {"action": "ivm-join-create", "rollup_root": rollup.root,
                "rows": rollup.df().count(),
                "source_version": {"fact": t.current_version(),
                                   "dim": dim.current_version()}}
    if args.action == "ivm-refresh":
        from .lakehouse.ivm import load_rollup

        if not args.rollup_root:
            raise ValueError("--rollup-root required")
        # load_rollup dispatches on the persisted config: single-table
        # rollups and join rollups refresh through the same action
        rollup = load_rollup(spark, args.rollup_root)
        return {"action": "ivm-refresh", **rollup.refresh()}
    if args.action == "full":
        report = maintenance.run_full_maintenance(
            t,
            name=args.table,
            sort_columns=args.sort_columns.split(",") if args.sort_columns else None,
            retention_days=args.retention_days,
            orphan_age_days=args.orphan_age_days,
        )
        return json.loads(report.to_json())
    raise ValueError(f"unknown action {args.action!r}")


def run_schedule(args: argparse.Namespace, iterations: int | None = None) -> None:
    """M10 cadence (iceberg_maintenance.py:390-408): hourly compaction,
    daily 02:00 full run, weekly Sunday 01:00 optimize; MV staleness
    checked every tick. `iterations` bounds the loop for tests."""
    import datetime as dt

    last_hourly = 0.0
    n = 0
    while iterations is None or n < iterations:
        now = time.time()
        local = dt.datetime.fromtimestamp(now)
        if now - last_hourly >= 3600:
            _print_result(run_action(_clone(args, action="compact")))
            last_hourly = now
        if local.hour == 2 and local.minute < 1:
            _print_result(run_action(_clone(args, action="full")))
        if local.weekday() == 6 and local.hour == 1 and local.minute < 1:
            _print_result(run_action(_clone(args, action="optimize")))
        _print_result(run_action(_clone(args, action="mv-refresh")))
        n += 1
        if iterations is None or n < iterations:
            time.sleep(args.schedule_interval_s)


def _clone(args: argparse.Namespace, **over) -> argparse.Namespace:
    d = dict(vars(args))
    d.update(over)
    return argparse.Namespace(**d)


def _print_result(result: dict) -> None:
    print(json.dumps(result, indent=2, default=str))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Lakehouse table maintenance")
    p.add_argument("--warehouse", required=True, help="warehouse root directory")
    p.add_argument(
        "--action",
        choices=[
            "compact",
            "expire",
            "rewrite-manifests",
            "optimize",
            "cleanup",
            "stats",
            "health",
            "mv-refresh",
            "full",
            "schedule",
            "tag",
            "rollback",
            "refs",
            "history",
            "wap-publish",
            "wap-discard",
            "bloom",
            "cdc-export",
            "clone",
            "ivm-create",
            "ivm-join-create",
            "ivm-refresh",
            "delete-mor",
            "materialize-deletes",
        ],
        default="full",
    )
    p.add_argument("--tag-name", default="")
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--wap-id", default="")
    p.add_argument("--bloom-columns", default="")
    p.add_argument("--predicate", default="")
    p.add_argument("--rollup-root", default="")
    p.add_argument("--clone-to", default="")
    p.add_argument("--group-cols", default="")
    p.add_argument("--sum-cols", default="")
    p.add_argument("--dim-table", default="")
    p.add_argument("--join-keys", default="")
    p.add_argument("--table", default="taxi_trips")
    p.add_argument("--retention-days", type=float, default=7.0)
    p.add_argument("--orphan-age-days", type=float, default=3.0)
    p.add_argument("--target-file-size-mb", type=int, default=128)
    p.add_argument("--sort-columns", default="")
    p.add_argument("--zorder-columns", default="")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--schedule-interval-s", type=float, default=60.0)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.action == "schedule":
        print("Starting maintenance scheduler...", file=sys.stderr)
        run_schedule(args)
    else:
        _print_result(run_action(args))
    return 0


if __name__ == "__main__":
    sys.exit(main())
