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


def bitmap_hourly(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """Per-(hour, bucket) exact bitmaps — the sliding-window increment."""
    k = F.col(key_col)
    return df.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("hr"),
        F.bitmap_bucket_number(k).alias("bucket"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(k)).alias("bitmap"))


def bitmap_sliding_distinct(
    hourly: DataFrame, window_hours: int = 6
) -> DataFrame:
    """Exact distinct count per SLIDING window from tumbling partials.

    Each hourly bitmap is exploded to the ``window_hours`` overlapping
    windows that contain it (window starts hr-(W-1)h .. hr), then OR-merged
    per (window, bucket). The overlap factor multiplies only kilobyte
    bitmap rows — never raw events — which is what makes sliding distinct
    affordable at 100 TB: a naive sliding COUNT(DISTINCT) re-scans every
    event W times; this re-merges every *bitmap* W times. Exact (not HLL),
    so the result equals a direct per-window COUNT(DISTINCT) bit for bit.
    """
    w = F.expr(f"INTERVAL {window_hours - 1} HOURS")
    slid = hourly.select(
        F.explode(
            F.sequence(
                F.col("hr") - w, F.col("hr"), F.expr("INTERVAL 1 HOUR")
            )
        ).alias("window_start"),
        "bucket",
        "bitmap",
    )
    return (
        slid.groupBy("window_start", "bucket")
        .agg(F.bitmap_or_agg("bitmap").alias("bitmap"))
        .groupBy("window_start")
        .agg(F.sum(F.bitmap_count("bitmap")).alias("exact_distinct"))
    )
