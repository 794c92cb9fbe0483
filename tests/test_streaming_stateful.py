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


@pytest.mark.parametrize("reliable_dir", [False, True])
def test_stateful_session_state_survives_restart(spark, tmp_path, reliable_dir):
    """An OPEN session's state (start/last/count) must be recovered from
    the checkpoint across a full stop/restart: events before the restart
    and events after it must fold into ONE session. If state were lost,
    the post-restart close would report a 1-event session starting at the
    post-restart timestamp — the assertion below distinguishes exactly
    that. Uses NoTimeout (finite replay mode) so processAllAvailable
    terminates, and a parquet sink so run-1 output (none expected)
    and run-2 output share one table.

    Parametrized over a configured GLOBAL reliable-checkpoint dir (r8
    verdict item 6): a real session mixes batch-iterative operators
    (which sc.setCheckpointDir for truncate_lineage's reliable branch)
    with stateful streams, and the applyInPandasWithState STATE STORE
    must keep recovering from the stream's own checkpoint while the
    global RDD checkpoint dir is set — the one store/checkpoint
    combination the r8 foreachBatch test didn't cover."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = tmp_path / "src"
    out = tmp_path / "sessions"
    ckpt = tmp_path / "ckpt"
    t0 = dt.datetime(2024, 3, 1)
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None, "suite must start without a dir"
    if reliable_dir:
        sc.setCheckpointDir(str(tmp_path / "reliable_ckpt"))

    def land(rows):
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_once():
        q = (
            streaming_sessionize(
                stream_events(spark, str(src)),
                gap_minutes=30,
                timeout=GroupStateTimeout.NoTimeout,
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    try:
        # run 1: two events 5 min apart -> session stays OPEN in state
        land([(0, t0, 7, "click", 1.0, "{}"),
              (1, t0 + dt.timedelta(minutes=5), 7, "click", 1.0, "{}")])
        run_once()
        assert not out.exists() or spark.read.parquet(str(out)).count() == 0

        # down-time arrivals: one more event INSIDE the gap (continues the
        # pre-restart session), then one far beyond it (forces the close)
        land([(2, t0 + dt.timedelta(minutes=10), 7, "click", 1.0, "{}"),
              (3, t0 + dt.timedelta(hours=3), 7, "click", 1.0, "{}")])
        run_once()

        got = [
            (r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(str(out)).collect()
        ]
        assert got == [(t0, t0 + dt.timedelta(minutes=10), 3)], got
    finally:
        sc._jsc.setCheckpointDir(None)
        assert sc.getCheckpointDir() is None
