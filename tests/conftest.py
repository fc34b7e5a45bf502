import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hamerkop_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hamerkop-tests", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def rows(df, *cols):
    """Collect as sorted list of tuples for order-insensitive asserts."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
