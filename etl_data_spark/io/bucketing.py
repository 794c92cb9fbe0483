"""Bucketed tables: shuffle-free co-located joins for repeated big-big joins.

At 100 TB the lineitem⋈orders-class join shuffles both sides on every query.
When that join is run repeatedly (a warehouse's hottest path), bucketing both
tables by the join key at write time pre-pays the shuffle once: Spark reads
bucket i of both tables into the same task and the join planner drops the
Exchange on both sides (asserted in tests/test_bucketing.py). This is the
engine's substitute for the co-located storage a distributed DBMS gets from
hash-distributed tables.

Rules of use baked into the helpers:
- bucket count is fixed at write time and must match across co-joined tables;
- the join key list must be a prefix-equal match of the bucket spec;
- sortBy within buckets lets the join run as a merge without an extra sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planner drops the
    shuffle on both sides when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
