import pytest

from etl_data_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl-data-spark-tests", shuffle_partitions=8)
    yield s
