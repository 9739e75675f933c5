from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from chrono_ts_spark.session import get_spark

    s = get_spark("chrono-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
