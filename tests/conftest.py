import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

SMOKE_DIR = "/root/testdata/sf0.001"

#: Slow-tier manifest (r16, the r15 verdict's #2): node ids measured
#: >= 1.75 s in the committed full durations run get the `slow`
#: marker here, and pytest.ini deselects them by default so the
#: driver's budgeted verify run finishes (the r15 full suite was
#: 44:48 against a ~21-min budget and recorded tests_ok:false while
#: green).  The full local gate still runs EVERYTHING:
#:     python -m pytest tests/ -q -m "slow or not slow"
#: Data-driven per-TEST marking (not per-file) keeps every suite's
#: fast cases — including every injection/edge-case family — in the
#: driver tier.
_SLOW_MANIFEST = os.path.join(os.path.dirname(__file__), "slow_manifest.txt")


def _slow_ids() -> frozenset[str]:
    try:
        with open(_SLOW_MANIFEST) as f:
            return frozenset(
                line.strip()
                for line in f
                if line.strip() and not line.startswith("#")
            )
    except FileNotFoundError:
        return frozenset()


def pytest_collection_modifyitems(config, items):
    slow = _slow_ids()
    if not slow:
        return
    marker = pytest.mark.slow
    for item in items:
        if item.nodeid in slow:
            item.add_marker(marker)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def smoke_dir():
    return SMOKE_DIR


@pytest.fixture(scope="session")
def check():
    """The scripts/check_oracle.py gate module, loaded once per session
    (it lives outside the import path).  Shared by every injection /
    gate-pin suite so gate changes touch one loader."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "check_oracle.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
