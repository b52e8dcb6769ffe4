"""Full streaming taxi pipeline: three-sink fan-out per micro-batch,
validation parity with the batch path, and Q22-style replayed-window
equivalence against a batch aggregation of the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import Warehouse
from de_gcp_lakehouse_iceberg_spark.sources import generator, ingest
from de_gcp_lakehouse_iceberg_spark.streaming import taxi


def _write_input(tmp_path, n=200, frac=0.15):
    trips = generator.corrupt_some(
        generator.generate_trips(n, seed=42), seed=43, frac=frac
    )
    generator.write_jsonl(trips, str(tmp_path / "in"), files=4)
    return str(tmp_path / "in")


def test_streaming_pipeline_three_sinks(spark, tmp_path):
    input_dir = _write_input(tmp_path)
    counts = taxi.run_streaming_pipeline(
        spark, input_dir, str(tmp_path / "wh"), max_files_per_trigger=1
    )
    assert counts["valid"] + counts["invalid"] == 200
    assert counts["invalid"] > 0
    assert counts["window_rows"] > 0
    wh = Warehouse(spark, str(tmp_path / "wh"))
    # multiple micro-batches → multiple stream_batch snapshots
    ops = [s.operation for s in wh.table("taxi_trips").snapshots()]
    assert sum(o.startswith("stream_batch_") for o in ops) >= 2
    # dead letters carry the reference envelope
    err = wh.table("processing_errors").scan().first()
    assert err.pipeline_name == "streaming_taxi_processor"
    assert err.error_type in {
        "missing_field",
        "invalid_timestamp_format",
        "invalid_timestamp_order",
        "validation_failed",
    }


def test_streaming_matches_batch_validation(spark, tmp_path):
    input_dir = _write_input(tmp_path)
    counts = taxi.run_streaming_pipeline(
        spark, input_dir, str(tmp_path / "wh")
    )
    classified = ingest.classify_trips(
        ingest.read_jsonl(spark, input_dir + "/*.jsonl")
    )
    batch_valid = classified.filter(F.col("_error_type").isNull()).count()
    assert counts["valid"] == batch_valid


def test_replayed_windows_equal_batch_windows(spark, tmp_path):
    input_dir = _write_input(tmp_path, frac=0.0)
    taxi.run_streaming_pipeline(spark, input_dir, str(tmp_path / "wh"))
    streamed = taxi.replayed_window_totals(spark, str(tmp_path / "wh")).collect()
    batch_valid = ingest.valid_trips(
        ingest.classify_trips(ingest.read_jsonl(spark, input_dir + "/*.jsonl"))
    )
    batch = (
        taxi.windowed_trip_stats(batch_valid)
        .groupBy("window_start", "window_end", "pickup_location_id")
        .agg(
            F.sum("trip_count").alias("trip_count"),
            F.round(F.sum("total_revenue"), 2).alias("total_revenue"),
        )
        .orderBy("window_start", "pickup_location_id")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
    assert len(streamed) > 0
