"""Hypertable-style multi-resolution rollups from reusable partials.

The continuous-aggregate pattern (TimescaleDB hypertables, Druid rollup
segments): scan the raw fact table ONCE at the finest grain, persist those
partial aggregates, and derive every coarser resolution by re-aggregating
partials — never touching raw rows again. At 100 TB this is the difference
between one scan and one scan per resolution; incrementally, new data only
updates its own fine-grain buckets and the coarser grains fold the deltas.

Only algebraic aggregates compose this way: COUNT (sum of counts),
SUM (sum of sums), MIN/MAX (min of mins / max of maxes), and anything
derivable from them at emit (AVG = sum/count). Holistic aggregates
(exact percentiles) need mergeable sketches instead — see
``operators/sketches.py`` for the same pattern applied to DISTINCT.

Float discipline: the measure is decimal-cast BEFORE the first
aggregation, so every partial sum is exact and re-aggregation order can
never change a bit — the property that makes the grain chain
hash-identical to a direct GROUP BY over raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_data_spark.caching import pin

ROLLUP_MEASURES = ("n_events", "sum_value", "min_value", "max_value")


def partial_buckets(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    minutes: int = 5,
) -> DataFrame:
    """Finest-grain partial aggregates: one row per tumbling bucket.

    This is the frame a hypertable materializes and incrementally
    maintains; everything coarser derives from it via :func:`reaggregate`.
    The groupBy partial-aggregates map-side before its single exchange.
    """
    return df.groupBy(
        F.window(F.col(ts_col), f"{minutes} minutes")["start"].alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(12,2)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def reaggregate(partials: DataFrame, bucket_expr) -> DataFrame:
    """Fold partials to a coarser grain — raw rows are never touched.

    ``bucket_expr`` maps the fine bucket column to its coarser bucket
    (e.g. ``date_trunc('hour', bucket)``); correctness requires each fine
    bucket to lie entirely inside one coarse bucket, which holds for any
    grain chain where each step divides the next (5min → 1h → 1d).
    """
    return partials.groupBy(bucket_expr.alias("bucket")).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def grain_chain(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """5min → 1h → 1d rollup chain emitting all three resolutions.

    The 5-minute partials are persisted and reused by the hourly branch;
    the daily branch folds the HOURLY frame, not the partials — each
    resolution is one re-aggregation of the previous one, exactly the
    incremental-refresh dependency order a scheduler would run. Exactly
    one scan of the fact table regardless of how many grains are emitted.
    """
    p5 = pin(partial_buckets(df, ts_col, value_col, minutes=5))
    hourly = pin(reaggregate(p5, F.date_trunc("hour", F.col("bucket"))))
    daily = reaggregate(hourly, F.date_trunc("day", F.col("bucket")))

    def emit(frame: DataFrame, grain: str) -> DataFrame:
        return frame.select(
            F.lit(grain).alias("grain"),
            F.col("bucket").alias("bucket_start"),
            F.col("n_events"),
            F.col("sum_value").cast("double").alias("sum_value"),
            F.col("min_value"),
            F.col("max_value"),
        )

    return emit(p5, "5min").unionByName(emit(hourly, "1h")).unionByName(
        emit(daily, "1d")
    )
