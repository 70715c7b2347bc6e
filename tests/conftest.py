import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

SMOKE_DIR = "/root/testdata/sf0.001"


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
