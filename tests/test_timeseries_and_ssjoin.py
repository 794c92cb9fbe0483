"""applyInPandas resampling semantics + watermarked stream-stream join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_data_spark.operators.timeseries import resample_ffill
from etl_data_spark.streaming.pipeline import (
    EVENTS_STREAM_SCHEMA,
    stream_events,
    stream_stream_join,
)


def test_resample_ffill_fills_gaps(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(minutes=5), 20.0),
        # 15-minute hole -> two grid points forward-filled with 20.0
        (1, t0 + dt.timedelta(minutes=20), 30.0),
        (2, t0 + dt.timedelta(minutes=2), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = resample_ffill(df, freq_minutes=5).orderBy("user_id", "grid_ts").collect()

    u1 = [(r["grid_ts"], r["value"], r["filled"]) for r in out if r["user_id"] == 1]
    assert [v for _, v, _ in u1] == [10.0, 20.0, 20.0, 20.0, 30.0]
    assert [f for _, _, f in u1] == [False, False, True, True, False]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["value"] == 5.0 and not u2[0]["filled"]


def test_resample_last_wins_on_duplicate_ts(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 1.0), (1, t0, 9.0)], "user_id long, ts timestamp, value double"
    )
    out = resample_ffill(df, freq_minutes=5).collect()
    assert len(out) == 1 and out[0]["value"] == 9.0


@pytest.fixture()
def click_purchase_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("ssj") / "events"
    t0 = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    for user in range(4):
        # clicks at t+0, t+10min; purchase at t+20min; stale click at t-2h
        base = t0 + dt.timedelta(hours=user)
        rows.append((eid, base - dt.timedelta(hours=2), user, "click", 0.0, "{}")); eid += 1
        rows.append((eid, base, user, "click", 0.0, "{}")); eid += 1
        rows.append((eid, base + dt.timedelta(minutes=10), user, "click", 0.0, "{}")); eid += 1
        rows.append((eid, base + dt.timedelta(minutes=20), user, "purchase", 9.99, "{}")); eid += 1
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(path))
    return str(path)


def test_stream_stream_join_pairs_within_gap(spark, click_purchase_dir):
    ev = stream_events(spark, click_purchase_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = stream_stream_join(clicks, purchases, max_gap_minutes=30)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("select * from ssj_out").collect()
    # per user: the 2 in-gap clicks pair with the purchase, the 2h-old one doesn't
    assert len(out) == 4 * 2
    per_user = {}
    for r in out:
        per_user.setdefault(r["p_user"], 0)
        per_user[r["p_user"]] += 1
    assert all(v == 2 for v in per_user.values())
