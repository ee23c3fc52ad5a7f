import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jmdfane_spark.session import get_spark  # noqa: E402
from jmdfane_spark.sources import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=8, app_name="jmdfane-tests")
    yield s


@pytest.fixture(scope="session")
def fixture_small():
    return synthetic.synthesize(n_blocks=5, min_rows=6, max_rows=25, hot_block_rows=60)


@pytest.fixture(scope="session")
def fixture_dfs(spark, fixture_small):
    return synthetic.to_spark(spark, fixture_small)
