"""Salted join / two-phase agg must be result-identical to the plain forms,
and must actually scatter the hot key across salt buckets."""

from pyspark.sql import functions as F

from etl_data_spark.operators.skew import (
    SALT_COL,
    salted_join,
    two_phase_agg,
    with_salt,
)


def _skewed_df(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(9000).select(
        F.lit(7).alias("k"), F.col("id").alias("row_id"), (F.col("id") % 100).alias("v")
    )
    tail = spark.range(1000).select(
        (F.col("id") % 50).alias("k"),
        (F.col("id") + 100000).alias("row_id"),
        (F.col("id") % 100).alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_join_equals_plain_join(spark):
    skewed = _skewed_df(spark)
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("k_name")
    )
    plain = skewed.join(dim, "k").select("row_id", "k", "k_name")
    salted = salted_join(
        skewed, dim, on=["k"], n_salts=8, scatter_cols=["row_id"]
    ).select("row_id", "k", "k_name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salt_scatters_hot_key(spark):
    skewed = _skewed_df(spark)
    buckets = (
        with_salt(skewed.filter(F.col("k") == 7), 8, "row_id")
        .groupBy(SALT_COL)
        .count()
        .collect()
    )
    assert len(buckets) == 8  # hot key spread over all salts
    counts = [r["count"] for r in buckets]
    assert max(counts) < 9000 * 0.3  # no bucket holds the hot key alone


def test_default_scatter_spreads_hot_key(spark):
    """Omitting scatter_cols must still spread the hot key: the default is
    row identity, not the join key (which would no-op the operator)."""
    skewed = _skewed_df(spark)
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("k_name")
    )
    plain = skewed.join(dim, "k").select("row_id", "k", "k_name")
    salted = salted_join(skewed, dim, on=["k"], n_salts=8).select(
        "row_id", "k", "k_name"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0

    hot = skewed.filter(F.col("k") == 7)
    buckets = (
        with_salt(hot, 8, *hot.columns).groupBy(SALT_COL).count().collect()
    )
    assert len(buckets) >= 2, "default scatter re-concentrated the hot key"
    counts = [r["count"] for r in buckets]
    assert max(counts) < 9000 * 0.5


def test_salted_join_refuses_outer(spark):
    import pytest

    skewed = _skewed_df(spark)
    dim = spark.range(60).select(F.col("id").alias("k"))
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(skewed, dim, on=["k"], how=how)


def test_two_phase_agg_equals_plain_agg(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).alias("count_rows"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    two = two_phase_agg(
        df,
        keys=["k"],
        aggs={
            "sum_v": F.sum("v"),
            "count_rows": F.count(F.lit(1)),
            "min_v": F.min("v"),
            "max_v": F.max("v"),
        },
        n_salts=16,
        scatter_cols=["row_id"],
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, two.collect()))
