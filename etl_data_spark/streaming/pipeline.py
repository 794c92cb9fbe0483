"""Structured Streaming surface of the engine.

The reference is purely batch (SURVEY §2.8) — these are the engine's
forward-looking stream equivalents of its batch operators, built on
readStream/writeStream with event-time semantics:

- ``stream_events``: file-source stream over the events schema (swap for
  kafka in production — the plan downstream is identical).
- ``windowed_counts``: tumbling-window count/sum with a watermark — the
  streaming twin of the batch ``window_agg_5min`` query (same results on
  the same finite input, verified in tests via the memory sink).
- ``streaming_cleanse``: the silver cleansing rules applied to a stream —
  stateless Column expressions apply unchanged, demonstrating batch/stream
  unification of the cleanse operator.
- ``streaming_dq_counts``: continuous DQ violation counters (the streaming
  face of the DQ framework).

All aggregations use event-time watermarks so state stores are bounded:
late rows beyond the watermark are dropped deterministically, and AQE-less
microbatch planning keeps per-batch shuffles keyed on (window, group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream (one file per microbatch by default)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .load(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def streaming_cleanse(events: DataFrame) -> DataFrame:
    """Stateless cleanse on a stream: clamp value, whitelist event types.

    Same rule shapes as the batch silver cleanse (cleanse.py) — Column
    expressions are batch/stream agnostic.
    """
    known = ["click", "view", "purchase", "signup", "error"]
    return events.select(
        "event_id",
        "ts",
        "user_id",
        F.when(~F.col("event_type").isin(known), "other")
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("value") < 0, 0.0)
        .when(F.col("value") > 10000, 10000.0)
        .otherwise(F.col("value"))
        .alias("value"),
    )


def streaming_dq_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Continuous DQ: per-window violation counters (negative values, nulls)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.count(F.when(F.col("value") < 0, 1)).alias("n_negative_value"),
            F.count(F.when(F.col("user_id").isNull(), 1)).alias("n_null_user"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(F.col("w.start").alias("window_start"), "n_negative_value",
                "n_null_user", "n_total")
    )


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream join: each purchase paired with same-user
    clicks from the preceding ``max_gap_minutes``.

    Both sides carry watermarks and the join has a time-range predicate, so
    Spark can bound the buffered state on each side to the gap + watermark
    horizon — without the range condition the state would grow forever.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        ),
    ).select("p_user", "purchase_id", "click_id", "purchase_ts", "click_ts")


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static join: enrich each event with dimension attributes.

    The static side is broadcast per microbatch (hinted explicitly so the
    plan survives statistics loss), and — unlike a stream-stream join — no
    join state is kept between batches: the dim is re-resolved every batch,
    so slowly-changing dimension updates are picked up automatically. This
    is the streaming twin of the batch star join.
    """
    return events.join(F.broadcast(dim), on, "left")


def run_to_memory(df: DataFrame, name: str) -> None:
    """Drive a finite streaming query to completion into a memory sink
    (local smoke-test harness; production uses kafka/delta sinks)."""
    q = (
        df.writeStream.outputMode("append" if df.isStreaming else "append")
        .format("memory")
        .queryName(name)
        .outputMode("complete" if _has_agg(df) else "append")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def stream_to_partitioned_table(
    df: DataFrame,
    path: str,
    date_col: str = "ts",
    checkpoint: str | None = None,
):
    """Stream -> month-partitioned parquet via foreachBatch, reusing the
    batch writer so the streaming sink and the batch gold tables share one
    layout (the medallion bridge: microbatches land as idempotent
    partition-pruned appends; exactly-once comes from the checkpointed
    batch id + append-only layout).
    """
    from etl_data_spark.io.writers import with_month_key

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            with_month_key(batch_df, date_col)
            .write.mode("append")
            .partitionBy("part_month")
            .parquet(path)
        )

    writer = df.writeStream.foreachBatch(write_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
