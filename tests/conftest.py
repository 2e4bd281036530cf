from __future__ import annotations

import faulthandler
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")


def pytest_addoption(parser):
    # In-repo stand-in for pytest-timeout (not installable in this
    # container): accepts the same --timeout flag. The watchdog uses
    # faulthandler.dump_traceback_later — pytest-timeout's own "thread"
    # method — so a hung streaming test dumps every thread's stack and
    # aborts the run instead of wedging the suite forever (round-7 verdict
    # task #9). 0 disables.
    parser.addoption(
        "--timeout",
        action="store",
        type=float,
        default=float(os.environ.get("SPARK_GRAFT_TEST_TIMEOUT", "600")),
        help="per-test watchdog seconds (0 disables); faulthandler-based "
        "stand-in for pytest-timeout",
    )


_WATCHDOG_LOG = None


@pytest.fixture(autouse=True)
def _per_test_watchdog(request):
    seconds = request.config.getoption("--timeout")
    if seconds and seconds > 0:
        # dump to a real file: pytest's capture redirects fd 2, so a dump
        # aimed at stderr would vanish with the killed process
        global _WATCHDOG_LOG
        if _WATCHDOG_LOG is None:
            _WATCHDOG_LOG = open("/tmp/pytest_watchdog.log", "w", buffering=1)
        _WATCHDOG_LOG.write(f"--- armed {seconds}s for {request.node.nodeid}\n")
        faulthandler.dump_traceback_later(seconds, exit=True, file=_WATCHDOG_LOG)
        try:
            yield
        finally:
            faulthandler.cancel_dump_traceback_later()
    else:
        yield


@pytest.fixture(scope="session")
def spark():
    from realestatedeals_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
