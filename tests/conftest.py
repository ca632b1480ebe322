import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


@pytest.fixture(scope="session")
def spark():
    from pure_python_geospatial_export_spark.session import get_spark

    s = get_spark(app_name="ppge-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()
