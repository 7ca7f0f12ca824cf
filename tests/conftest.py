import pytest

from easyner_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="easyner_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    # keep session alive across test modules; stop at interpreter exit
