from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sales_data_pipeline_gcp_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
#: parity fixtures scale: default sf0.01 (the driver's CORRECTNESS scale);
#: the round-end gate re-runs the same suite at sf0.1 (make sweep) — the
#: only scale where two real round-1 bugs (decimal 2^53 overflow, window
#: tie ambiguity) were observable.
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", driver_memory="32g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE


@pytest.fixture(scope="session")
def sf_smoke_dir() -> str:
    return SF_SMOKE
