from __future__ import annotations

import pytest

from de_gcp_lakehouse_iceberg_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir_medium():
    return "/root/testdata/sf0.01"
