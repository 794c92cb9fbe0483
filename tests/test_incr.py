"""Invariant tests for the incremental-warehouse operators (cdc/sketches/
layout/interval-merge) — properties the DuckDB oracles can't express:
replayability, idempotence, mergeability under arbitrary splits, and
layout locality.
"""

import pytest
from pyspark.sql import functions as F

from etl_data_spark.operators import cdc as CDC
from etl_data_spark.operators import layout as L
from etl_data_spark.operators import sketches as SK
from etl_data_spark.operators.temporal import merge_intervals
from etl_data_spark.queries import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def snapshots(spark):
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 7 != 0)
    new = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    return old.cache(), new.cache()


def test_snapshot_diff_replays_old_into_new(spark, snapshots):
    """Applying the change feed to `old` must reproduce `new` exactly —
    the defining property of a CDC feed."""
    old, new = snapshots
    feed = CDC.snapshot_diff(old, new, ["o_orderkey"]).cache()

    upserts = feed.filter(F.col("op").isin("I", "U")).select(
        "o_orderkey",
        F.col("new_o_orderstatus").alias("o_orderstatus"),
        F.col("new_o_totalprice").alias("o_totalprice"),
    )
    deletes = feed.filter(F.col("op") == "D").select("o_orderkey")
    replayed = CDC.merge_upsert(
        old.join(deletes, "o_orderkey", "left_anti"), upserts, ["o_orderkey"]
    )
    assert replayed.exceptAll(new).count() == 0
    assert new.exceptAll(replayed).count() == 0


def test_snapshot_diff_drops_unchanged_rows(spark, snapshots):
    old, new = snapshots
    feed = CDC.snapshot_diff(old, new, ["o_orderkey"])
    # a key in both snapshots with identical payload must not appear
    unchanged = (
        old.join(new, ["o_orderkey", "o_orderstatus", "o_totalprice"])
        .select("o_orderkey")
        .join(feed, "o_orderkey")
    )
    assert unchanged.count() == 0


def test_merge_upsert_idempotent(spark, snapshots):
    old, new = snapshots
    src = new.filter(F.col("o_orderkey") % 3 == 0)
    once = CDC.merge_upsert(old, src, ["o_orderkey"]).cache()
    twice = CDC.merge_upsert(once, src, ["o_orderkey"])
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_scd2_single_current_and_contiguous(spark):
    c = load_table(spark, SF, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    changes = (
        c.filter(F.col("c_custkey") % 4 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
        .withColumn("ts", F.lit("2024-01-10 00:00:00").cast("timestamp"))
    )
    hist = CDC.apply_scd2(c, changes, ["c_custkey"], "ts").cache()

    per_key = hist.groupBy("c_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    assert per_key.filter(F.col("n_current") != 1).count() == 0

    # every closed version's effective_to equals the next version's start
    from pyspark.sql import Window

    w = Window.partitionBy("c_custkey").orderBy("effective_from")
    gaps = hist.withColumn("next_from", F.lead("effective_from").over(w)).filter(
        F.col("effective_to").isNotNull()
        & (F.col("effective_to") != F.col("next_from"))
    )
    assert gaps.count() == 0


def test_bitmap_rollup_merge_invariant(spark):
    """Distinct-by-merge must equal distinct-on-raw no matter how rows are
    split into increments — here daily splits vs one global bitmap."""
    e = load_table(spark, SF, "events")
    daily = SK.bitmap_daily(e, "ts", "user_id")
    merged = SK.bitmap_rollup(daily.withColumn("g", F.lit(1)).drop("day"), F.col("g"))
    direct = e.agg(F.count_distinct("user_id").alias("exact"))
    assert merged.collect()[0]["exact_distinct"] == direct.collect()[0]["exact"]


def test_hll_estimate_within_tolerance(spark):
    e = load_table(spark, SF, "events")
    daily = SK.hll_daily_sketches(e, "ts", "user_id")
    est = SK.hll_rollup(daily.withColumn("g", F.lit(1)).drop("day"), F.col("g"))
    exact = e.select(F.count_distinct("user_id").alias("n")).collect()[0]["n"]
    approx = est.collect()[0]["approx_distinct"]
    assert abs(approx - exact) <= max(2, 0.06 * exact)


def test_merged_islands_are_disjoint(spark):
    e = load_table(spark, SF, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    islands = merge_intervals(iv, "user_id", "s", "e").cache()

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("island_start")
    overlaps = islands.withColumn(
        "next_start", F.lead("island_start").over(w)
    ).filter(
        F.col("next_start").isNotNull()
        & (F.col("next_start") <= F.col("island_end"))
    )
    assert overlaps.count() == 0
    # islands cover every interval: counts add up
    n_src = iv.count()
    assert islands.agg(F.sum("n_intervals")).collect()[0][0] == n_src


def test_zorder_bucket_locality(spark):
    """Z-bucketing must localize BOTH dimensions: the mean per-bucket span
    must be far below the global span in x and y."""
    o = load_table(spark, SF, "orders").select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).alias("day"),
    )
    # small shift: sf0.001 keys occupy few high bits, finer buckets needed
    stats = L.zorder_bucket_stats(o, "o_custkey", "day", bits=16, bucket_shift=14)
    rows = stats.collect()
    assert len(rows) > 4
    gx = o.agg(F.max("o_custkey") - F.min("o_custkey")).collect()[0][0]
    gy = o.agg(F.max("day") - F.min("day")).collect()[0][0]
    mean_span_x = sum(r["max_x"] - r["min_x"] for r in rows) / len(rows)
    mean_span_y = sum(r["max_y"] - r["min_y"] for r in rows) / len(rows)
    assert mean_span_x < 0.7 * gx
    assert mean_span_y < 0.7 * gy


def test_zorder_write_roundtrip(spark, tmp_path):
    o = load_table(spark, SF, "orders")
    path = str(tmp_path / "orders_z")
    L.write_zordered(
        o.select(
            "o_orderkey",
            "o_custkey",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).alias("day"),
        ),
        path,
        "o_custkey",
        "day",
        n_files=8,
    )
    back = spark.read.parquet(path)
    assert back.count() == o.count()
    assert set(back.columns) == {"o_orderkey", "o_custkey", "day"}
