"""Co-bucketed join must plan WITHOUT an exchange on either side, and match
the plain join's results."""

import pytest
from pyspark.sql import functions as F

from etl_data_spark.io.bucketing import bucketed_join, write_bucketed
from etl_data_spark.queries import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{wh}'")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus", "o_totalprice"
    )
    write_bucketed(li, "bktdb.lineitem_b", ["l_orderkey"], n_buckets=8)
    write_bucketed(o, "bktdb.orders_b", ["l_orderkey"], n_buckets=8)
    yield "bktdb.lineitem_b", "bktdb.orders_b"
    spark.sql("DROP DATABASE bktdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast: at test scale the planner would broadcast the
    # tiny side and skip the bucketed path entirely (at 100 TB neither side
    # broadcasts — this conf reproduces that regime)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, on=["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = bucketed_join(spark, lt, rt, on=["l_orderkey"]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("total"),
    )
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("total"),
    )
    assert bucketed.collect() == plain.collect()
