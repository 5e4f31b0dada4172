from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from databridge_etl_tools_spark.session import get_session

SMOKE_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SMOKE_SF
