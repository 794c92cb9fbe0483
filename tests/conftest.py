import pytest

from etl_data_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl-data-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="module", autouse=True)
def _isolate_session_cache():
    """Clear cached/persisted plans between test modules.

    Operators persist reusable subplans (dedup shingles/bands) and some
    tests cache fixtures; the session-scoped SparkSession would otherwise
    carry those InMemoryRelations across modules, where CacheManager
    substitutes them into OTHER queries' plans and breaks plan pins
    (seen: test_interval_merge_single_user_shuffle counting a doubled
    user_id exchange only in full-suite order).
    """
    yield
    from pyspark.sql import SparkSession

    from etl_data_spark.caching import release_all

    release_all()
    s = SparkSession.getActiveSession()
    if s is not None:
        s.catalog.clearCache()
