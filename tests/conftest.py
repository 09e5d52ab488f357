import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from margaret_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="margaret-spark-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_log_dir(tmp_path):
    return str(tmp_path / "log")
