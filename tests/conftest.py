import pytest

from gohangout_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gohangout-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
