"""Stateful driver queries (the ones that BUILD LakeTables under /tmp)
must be rerunnable in one session with identical results — the driver
and bench both invoke each query repeatedly."""

from __future__ import annotations

import pytest

from de_gcp_lakehouse_iceberg_spark.plans import QUERIES

_STATEFUL = [
    "q67_bucket_prune_proof",
    "q68_spec_evolution_prune",
    "q69_wap_rollback",
    "q73_bloom_prune_proof",
    "q80_mor_delete_lifecycle",
]


@pytest.mark.parametrize("name", _STATEFUL)
def test_stateful_query_rerun_identical(spark, sf_dir, name):
    first = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]
    second = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]
    assert first == second
    assert len(first) >= 1
