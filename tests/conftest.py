import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from datamancer_spark import get_spark

    s = get_spark(app_name="datamancer-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SF_DIR", "/root/testdata/sf0.001")


def rows_set(df):
    """Order-insensitive row comparison helper."""
    return sorted(tuple(r) for r in df.collect())
