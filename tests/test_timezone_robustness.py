"""Session-timezone robustness: time-bucketing queries must match the
UTC oracle even when the caller's session starts in another zone —
tables.table() pins the session to UTC at read time, and this locks
that contract."""

from __future__ import annotations

import pytest

from de_gcp_lakehouse_iceberg_spark.testing import compare_query

_TZ_SENSITIVE = [
    "q08_hourly_pattern",
    "q22_tumbling_window",
    "q29_sessionization",
    "q56_asof_error_context",
    "q60_stats_pruned_scan",
    # round-4 time-based queries
    "q67_bucket_prune_proof",
    "q68_spec_evolution_prune",
    "q76_resample_gapfill",
    "q78_retention_cohorts",
]


@pytest.mark.parametrize("name", _TZ_SENSITIVE)
def test_queries_survive_non_utc_session(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ok, msg = compare_query(spark, sf_dir, name)
        assert ok, msg
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
