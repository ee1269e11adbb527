import sys

import pytest

sys.path.insert(0, "/root/repo")

from vid_dup_finder_lib_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
