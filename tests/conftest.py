from __future__ import annotations

import pytest

from workspace_qdrant_mcp_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "scale: sf0.1 heavy-hitter oracle-parity tier (runs by default; "
        "deselect with -m 'not scale' for a fast pass)",
    )
    config.addinivalue_line(
        "markers",
        "stress10x: opt-in 10x near-dup stress-corpus scale-shape tier "
        "(skipped unless SPARK_GRAFT_STRESS10X=1; ~3 min)",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wqm-spark-tests", shuffle_partitions=8)
    yield s
