"""Stateful streaming: applyInPandasWithState sessionization must emit
exactly the batch sessionizer's closed sessions; streaming dedup must drop
within-watermark duplicates."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_data_spark.operators.temporal import session_stats
from etl_data_spark.streaming.pipeline import (
    EVENTS_STREAM_SCHEMA,
    run_to_memory,
    stream_events,
)
from etl_data_spark.streaming.stateful import streaming_dedup, streaming_sessionize


@pytest.fixture(scope="module")
def sessions_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("stateful") / "events"
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for user in range(5):
        t = t0 + dt.timedelta(minutes=3 * user)
        for sess in range(3):
            for i in range(4 + user % 3):
                rows.append((eid, t, user, "click", 1.0, "{}"))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=45)  # exceed the 30-min gap
    df = spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(path))
    return str(path)


def test_streaming_sessions_match_batch_closed_sessions(spark, sessions_dir):
    stream = stream_events(spark, sessions_dir)
    out = streaming_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    # processAllAvailable() never returns under ProcessingTimeTimeout (the
    # engine keeps scheduling state-cleanup batches), so poll for the data
    # batch instead
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if q.exception():
            raise AssertionError(q.exception())
        if p and p.get("batchId", -1) >= 1:
            break
        time.sleep(1)
    q.stop()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sessions_out").collect()
    }

    batch = spark.read.parquet(sessions_dir)
    all_sessions = session_stats(batch, ts_col="ts", key_col="user_id")
    # closed sessions = all but each user's last (the stream never saw a
    # gap after the final session, so it stays open in state)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("session_start"))
    closed = (
        all_sessions.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("user_id", "session_start", "session_end", "n_events")
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in closed.collect()
    }
    assert streamed == expected
    assert len(streamed) == 5 * 2  # 3 sessions per user, last stays open


def test_streaming_dedup_drops_duplicates(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("dedup_stream") / "events"
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i % 40, t0 + dt.timedelta(seconds=30 * (i % 40)), 1, "click", 1.0, "{}")
        for i in range(60)  # ids 0..39, ids 0..19 duplicated
    ]
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(path))

    stream = stream_events(spark, str(path))
    run_to_memory(streaming_dedup(stream, ["event_id"]), "dedup_out")
    out = spark.sql("select * from dedup_out")
    assert out.count() == 40
    assert out.select("event_id").distinct().count() == 40
