from __future__ import annotations

import pytest

from vega_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("vega-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
