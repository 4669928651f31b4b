import os

import pytest

# Spark Python workers must be able to unpickle classes defined in test
# modules; extend the worker search path BEFORE the JVM starts.
_tests_dir = os.path.dirname(os.path.abspath(__file__))
if _tests_dir not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _tests_dir + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

from min_flink_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small parallelism keeps the test suite fast; production defaults
    # live in min_flink_spark.session.get_spark.
    s = get_spark(app_name="min-flink-spark-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
