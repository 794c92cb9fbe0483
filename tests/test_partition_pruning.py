"""Partition pruning on the month-partitioned writer — the access path that
replaces the reference's B-tree date indexes — plus join-strategy hints."""

import datetime as dt

from pyspark.sql import functions as F

from etl_data_spark.generate import generate_source
from etl_data_spark.io.writers import MONTH_KEY, with_month_key, write_partitioned
from etl_data_spark.queries import load_table


def test_month_partition_prunes_files(spark, tmp_path):
    df = generate_source(spark, rows=2000, seed=7)
    path = str(tmp_path / "silver_part")
    write_partitioned(df, path, date_col="effective_from")

    back = spark.read.parquet(path)
    pruned = back.filter(F.col(MONTH_KEY) == 202303)
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert f"{MONTH_KEY}#" in plan.split("PartitionFilters: [")[1].split("]")[0]

    # pruning must reflect in data too: only March rows come back
    months = {
        r[0]
        for r in pruned.select(
            (F.year("effective_from") * 100 + F.month("effective_from"))
        ).distinct().collect()
    }
    assert months == {202303}


def test_derived_month_key_matches_date(spark):
    df = generate_source(spark, rows=500, seed=7)
    bad = with_month_key(df).filter(
        F.col(MONTH_KEY)
        != (F.year("effective_from") * 100 + F.month("effective_from")).cast("int")
    )
    assert bad.count() == 0


def test_shuffle_hash_join_hint_respected(spark):
    # for mid-size tables where sort cost dominates, shuffle-hash beats SMJ;
    # the hint must survive planning (broadcast stays off to expose it)
    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
