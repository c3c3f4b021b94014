import pytest

from sophox_spark.plans import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sophox_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
