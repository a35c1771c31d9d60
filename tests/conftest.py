from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_project_hust_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests")
    yield s


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow_tier: slowest non-oracle tests — skipped unless "
        "SPARK_GRAFT_SLOW_TESTS=1 (VERDICT r9 #7: keep the default "
        "suite under 30 min; round-close certification always sets "
        "the flag, so nothing is certified without them)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier (set SPARK_GRAFT_SLOW_TESTS=1)")
    for item in items:
        if "slow_tier" in item.keywords:
            item.add_marker(skip)
