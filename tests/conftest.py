import pytest

from min_flink_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small parallelism keeps the test suite fast; production defaults
    # live in min_flink_spark.session.get_spark.
    s = get_spark(app_name="min-flink-spark-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
