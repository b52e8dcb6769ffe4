"""Process-TZ robustness: the driver's gate runs with whatever TZ env
the host has, and PySpark converts NAIVE datetime literals with the
PROCESS timezone (py4j DatetimeConverter / TimestampType.toInternal use
time.mktime) — `spark.sql.session.timeZone` cannot fix that. Round 4's
only red row (q60) was exactly this bug.

tests/test_timezone_robustness.py varies only the SESSION timezone;
this test runs the TZ-sensitive query list in a SUBPROCESS with
`TZ=America/New_York` (DST-bearing, -5/-4h) and compares against the
DuckDB oracle. A naive-datetime literal anywhere in these query paths
shifts the cut point by hours and fails the value compare.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

# the queries whose plans carry datetime literals / timestamp cuts,
# plus timestamp-RETURNING queries (their collect() output is rendered
# in process-local wall clock — the compare must be instant-based)
TZ_SENSITIVE = [
    "q60_stats_pruned_scan",
    "q56_asof_error_context",
    "q67_bucket_prune_proof",
    "q68_spec_evolution_prune",
    "q76_resample_gapfill",
    "q99_bigquery_sql_text",   # SQL-text interval arithmetic on timestamps
    "q13_rank_selfjoin",
    "q14_lag_rolling",
    "q22_tumbling_window",
    "q02_minmax_probe",      # TIMESTAMP_NTZ output: must compare verbatim
]

_CHILD = textwrap.dedent(
    """
    import sys
    from de_gcp_lakehouse_iceberg_spark.session import get_spark
    from de_gcp_lakehouse_iceberg_spark.testing import compare_query

    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2]
    spark = get_spark("tz-parity", cpus=8)
    failures = []
    for name in names:
        ok, msg = compare_query(spark, sf_dir, name)
        print(f"{name}: {'OK' if ok else 'FAIL'} {msg}", flush=True)
        if not ok:
            failures.append(f"{name}: {msg}")
    spark.stop()
    if failures:
        print("TZFAIL " + " | ".join(failures))
        sys.exit(1)
    print("TZOK")
    """
)


def test_queries_match_oracle_under_nonutc_process_tz():
    env = dict(os.environ)
    env["TZ"] = "America/New_York"
    env["PYTHONPATH"] = "/root/repo"
    # one subprocess for all queries: the JVM launch dominates cost
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, ",".join(TZ_SENSITIVE),
         "/root/testdata/sf0.001"],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0 and "TZOK" in proc.stdout, (
        f"TZ=America/New_York oracle parity failed:\n{out[-4000:]}"
    )
