import pytest

from guardian_for_apache_kafka_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="guardian-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
