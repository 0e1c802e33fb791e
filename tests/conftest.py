from __future__ import annotations

import pytest

from calaveras_uniteus_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Modules whose batteries sweep the whole registry or run oracle
# differentials — the bulk of the suite's ~20 min. Marked slow at
# collection so `pytest -m "not slow"` is the <5-min inner loop;
# the unmarked full run stays the gate.
_SLOW_MODULES = {
    "test_round5_queries",
    "test_round6_queries",
    "test_plan_lint",
    "test_plan_shape",
    "test_oracle_queries",
    "test_streaming",
    "test_scale_guards",
    "test_cross_engine_edge_cases",
    "test_harness_mutation",
    "test_properties",
    "test_prefix",
    "test_approx_tolerance",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
