import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small JVM for unit tests


@pytest.fixture(scope="session")
def spark():
    from snapshot_sender_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
