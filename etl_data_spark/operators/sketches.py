"""Mergeable sketch aggregation: incremental distinct counts at scale.

At 100 TB you never re-scan history to answer "distinct users this month" —
you keep a per-day sketch (kilobytes) and merge. Two tiers, both built on
Spark's native Datasketches-backed SQL aggregates (JVM-side, codegen'd,
no Python in the loop):

- **HLL** (``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``)
  — approximate, fixed ~1.5 KB per sketch at lgK=12, ~1.6% standard error.
- **Bitmap** (``bitmap_bucket_number`` / ``bitmap_bit_position`` /
  ``bitmap_construct_agg`` / ``bitmap_or_agg`` / ``bitmap_count``) — EXACT
  mergeable distinct counts for integer keys: each (group, bucket) holds a
  32 Ki-bit bitmap, rollups OR the bitmaps. Cost scales with key-space /
  32 Ki buckets per group, not with row count.

Both shapes are partial-aggregatable: daily sketches are built map-side
(partial HashAggregate before any exchange), persisted once, and every
later rollup touches only sketch bytes — never the raw events again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_daily_sketches(
    df: DataFrame, ts_col: str, key_col: str, lgk: int = 12
) -> DataFrame:
    """Per-day HLL sketch of ``key_col`` — the persisted increment."""
    return df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch")
    )


def hll_rollup(sketches: DataFrame, group_col) -> DataFrame:
    """Merge daily sketches to a coarser grain and estimate."""
    return (
        sketches.groupBy(group_col)
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            group_col,
            F.hll_sketch_estimate("merged").alias("approx_distinct"),
        )
    )


def bitmap_daily(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """Per-(day, bucket) exact bitmaps of an integer key — the increment.

    ``bitmap_bucket_number`` shards the key space into 32 Ki-bit buckets so
    no single bitmap exceeds 4 KB; the groupBy partial-aggregates map-side.
    """
    k = F.col(key_col)
    return df.groupBy(
        F.to_date(ts_col).alias("day"),
        F.bitmap_bucket_number(k).alias("bucket"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(k)).alias("bitmap"))


def bitmap_rollup(daily: DataFrame, group_col) -> DataFrame:
    """OR daily bitmaps to a coarser grain; exact distinct per group.

    Two-phase: OR within (group, bucket), then SUM of per-bucket
    cardinalities. Exact regardless of how rows were split across days —
    the property approximate sketches trade away.
    """
    return (
        daily.groupBy(group_col, "bucket")
        .agg(F.bitmap_or_agg("bitmap").alias("bitmap"))
        .groupBy(group_col)
        .agg(F.sum(F.bitmap_count("bitmap")).alias("exact_distinct"))
    )
