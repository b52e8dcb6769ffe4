from __future__ import annotations

import tempfile

import pytest

from de_gcp_lakehouse_iceberg_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # warehouse in a fresh tmp dir: saveAsTable tests (bucketing) must be
    # rerunnable even if a prior run was killed before its DROP TABLE —
    # a stale ./spark-warehouse/<table> dir would otherwise raise
    # LOCATION_ALREADY_EXISTS on the next run.
    wh = tempfile.mkdtemp(prefix="spark-warehouse-")
    s = get_spark("tests", cpus=8, warehouse_dir=wh)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir_medium():
    return "/root/testdata/sf0.01"
