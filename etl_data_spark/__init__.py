"""etl_data_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (Nikitpolin/etl-data): medallion data model
(bronze -> silver -> gold star schema), declarative data-quality framework,
windowed idempotent loads, plus large-scale training-data operators
(deduplication, similarity search, text analysis, multimodal columns).

Everything is expressed Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, Parquet columnar storage partitioned for pruning, broadcast joins
for small dimensions, and Arrow-vectorized Pandas UDFs only where built-in
operators cannot express the semantics.
"""

__version__ = "0.1.0"

from etl_data_spark.caching import pin, release_all  # noqa: F401
from etl_data_spark.session import get_spark  # noqa: F401
