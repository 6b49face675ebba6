import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from memex_kg_spark.session import get_spark

    s = get_spark(app="memex-kg-tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir_smoke():
    from memex_kg_spark.synth import ensure_synth

    return ensure_synth(0.001)


@pytest.fixture(scope="session")
def testdata_sf001():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def testdata_sf01():
    return "/root/testdata/sf0.01"
