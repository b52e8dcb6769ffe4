"""Pipeline CLI — the engine's counterpart of the reference's unified
template entry point (main.py:404-442: argparse → mode dispatch →
batch | streaming pipeline).

    python -m de_gcp_lakehouse_iceberg_spark.pipeline_cli \
        --mode batch --input '/data/trips/*.jsonl' --warehouse /wh

    python -m de_gcp_lakehouse_iceberg_spark.pipeline_cli \
        --mode streaming --input /data/stream_dir --warehouse /wh \
        --window-seconds 60

Batch: JSONL (or positional NYC CSV with --format csv) → validate →
taxi_trips + hourly_trip_stats + processing_errors (run_batch_pipeline).
Streaming: bounded availableNow run of the three-sink streaming flow
(run_streaming_pipeline). Both print one JSON result line.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Taxi lakehouse ingest pipeline")
    p.add_argument("--mode", choices=["batch", "streaming"], default="batch")
    p.add_argument("--input", required=True, help="input glob (batch) or dir (streaming)")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--format", choices=["jsonl", "csv"], default="jsonl")
    p.add_argument("--window-seconds", type=int, default=60)  # main.py:419
    p.add_argument(
        "--max-files-per-trigger", type=int, default=1,
        help="streaming micro-batch size control",
    )
    return p


def run(args: argparse.Namespace) -> dict:
    from .session import get_spark

    spark = get_spark(f"taxi-{args.mode}")
    if args.mode == "batch":
        from .sources import ingest

        if args.format == "csv":
            raw = ingest.read_nyc_csv(spark, args.input)
            classified = ingest.classify_trips(raw, mode="batch").cache()
            valid = ingest.valid_trips(classified)
            invalid = ingest.invalid_trips(classified)
            import os

            from .lakehouse import LakeTable
            from pyspark.sql import functions as F

            trips = LakeTable.create(
                spark,
                os.path.join(args.warehouse, "taxi_trips"),
                partition_by=["pickup_date"],
            )
            trips.append(
                valid.withColumn(
                    "pickup_date", F.to_date("pickup_datetime").cast("string")
                )
            )
            stats = LakeTable.create(
                spark, os.path.join(args.warehouse, "hourly_trip_stats")
            )
            stats.append(ingest.hourly_stats(valid))
            errors = LakeTable.create(
                spark, os.path.join(args.warehouse, "processing_errors")
            )
            errors.append(invalid)
            counts = {
                "valid": trips.snapshot().total_rows,
                "invalid": errors.snapshot().total_rows,
                "stats_rows": stats.snapshot().total_rows,
            }
            classified.unpersist()
            return {"mode": "batch", "format": "csv", **counts}
        counts = ingest.run_batch_pipeline(spark, args.input, args.warehouse)
        return {"mode": "batch", "format": "jsonl", **counts}

    from .streaming import taxi

    counts = taxi.run_streaming_pipeline(
        spark,
        args.input,
        args.warehouse,
        window=f"{args.window_seconds} seconds",
        max_files_per_trigger=args.max_files_per_trigger,
    )
    return {"mode": "streaming", **counts}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    print(json.dumps(run(args)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
