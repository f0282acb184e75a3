import pytest


@pytest.fixture(scope="session")
def spark():
    from kawa_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="kawa_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()
