"""Every registered query must match its DuckDB oracle at sf0.001.

This is the local pre-flight for the driver's CORRECTNESS gate.
"""

import os

import pytest

from etl_data_spark.catalog import REGISTRY
from tests.oracle_harness import compare

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    problems = compare(df, SF_DIR, spec.oracle)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
