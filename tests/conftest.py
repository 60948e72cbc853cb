import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small JVM for unit tests


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from snapshot_sender_spark.session import get_spark

    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="tests",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},  # static conf: set at build
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
