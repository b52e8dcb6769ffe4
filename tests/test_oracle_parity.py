"""Replicates the driver's correctness gate locally: every registered
query must match its DuckDB oracle (row count + columns + values) at
sf0.001; a smoke subset also runs at sf0.01."""

from __future__ import annotations

import pytest

from de_gcp_lakehouse_iceberg_spark.plans import ORACLE_SQL, QUERIES
from de_gcp_lakehouse_iceberg_spark.testing import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle_sf0001(spark, sf_dir, name):
    ok, msg = compare_query(spark, sf_dir, name)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle_sf001(spark, sf_dir_medium, name):
    ok, msg = compare_query(spark, sf_dir_medium, name)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "region_name",
        "nation_name",
        "item_count",
        "revenue",
        "avg_quantity",
    ]
    keys = set(QUERIES)
    assert set(e.oracle_sql()) <= keys
