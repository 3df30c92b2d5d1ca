import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "perf: wall-clock regression guards (generous ceilings, but can "
        "flake on a heavily loaded shared host; deselect with -m 'not perf')",
    )


@pytest.fixture(scope="session")
def spark():
    from vectorchord_spark.session import get_spark

    s = get_spark(app_name="vectorchord-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
