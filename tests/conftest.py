from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Two-tier suite (r14 verdict item 1): the full suite outgrew the
# driver's verification window (1104 tests, ~77 min on this host), so a
# verify gate that plain `pytest tests/` can finish is worth more than
# breadth it never completes.  The DEFAULT tier keeps every
# oracle-parity, invariant, correctness and plan-pin test; the SLOW tier
# holds the brute-force cross-validation sweeps and property suites that
# re-prove operator *algorithms* against independent references — they
# guard development-time regressions, not per-round results, and they
# are exactly the tests whose runtime grows superlinearly with the
# registry.  Opt in with `--runslow` or SPARK_GRAFT_SLOW_TESTS=1
# (`SPARK_GRAFT_SLOW_TESTS=1 python -m pytest tests/` runs everything).
_RUN_SLOW = os.environ.get("SPARK_GRAFT_SLOW_TESTS", "") not in ("", "0")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (the cross-validation/property tier)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: opt-in tier (brute-force cross-validation / property sweeps); "
        "skipped unless --runslow or SPARK_GRAFT_SLOW_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if _RUN_SLOW or config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --runslow or set SPARK_GRAFT_SLOW_TESTS=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from npm_mirror_spark.session import get_spark

    s = get_spark(app_name="npm-mirror-spark-tests", master="local[*]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
