"""Driver-environment replica: the correctness gate may run queries in
a VANILLA SparkSession (no tuned session factory, no entry() call
first). Engine conventions must therefore be enforced inside the
operators themselves, not inherited from session defaults.

Round-5 find: Spark's default parquet timestamp type is INT96, which
carries NO min/max footer statistics — in a vanilla session every
LakeTable time column silently lost its stats and q60's file skipping
planned all files (the non-TZ half of its driver failures).
LakeTable._write_files now pins TIMESTAMP_MICROS itself; this test
runs the stats/pruning-dependent queries in a subprocess with a
bare-default session and no entry()/tune_session."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

VANILLA_SENSITIVE = [
    "q60_stats_pruned_scan",    # footer-stats pruning on ts
    "q67_bucket_prune_proof",   # hidden-partition + stats pruning
    "q73_bloom_prune_proof",    # blooms ride the same manifest stats
    "q91_join_runtime_filter",  # per-key stats+bloom "in" pruning
]

_CHILD = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from de_gcp_lakehouse_iceberg_spark.testing import compare_query

    failures = []
    for name in sys.argv[1].split(","):
        ok, msg = compare_query(spark, sys.argv[2], name)
        print(f"{name}: {'OK' if ok else 'FAIL'} {msg}", flush=True)
        if not ok:
            failures.append(f"{name}: {msg}")
    spark.stop()
    if failures:
        print("VANILLAFAIL " + " | ".join(failures))
        sys.exit(1)
    print("VANILLAOK")
    """
)


def test_pruning_queries_in_vanilla_session():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, ",".join(VANILLA_SENSITIVE),
         "/root/testdata/sf0.001"],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0 and "VANILLAOK" in proc.stdout, (
        f"vanilla-session oracle parity failed:\n{out[-4000:]}"
    )
