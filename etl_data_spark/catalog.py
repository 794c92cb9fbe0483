"""Unified query catalog: importing this module registers every query.

``__spark_entry__`` exposes exactly this surface to the grading driver.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

import etl_data_spark.queries as _rel
import etl_data_spark.queries_ext as _ext  # noqa: F401  (registers on import)
import etl_data_spark.queries_llm as _llm  # noqa: F401  (registers on import)
from etl_data_spark.queries import REGISTRY, QuerySpec  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rel.q_pricing_summary(spark, sf_dir)
