"""Source round-trips: schema'd CSV/JSON with corrupt-record rejection."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_data_spark.io.sources import (
    CORRUPT_COL,
    read_csv,
    read_json,
    split_valid,
    write_csv,
    write_json,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("salary", T.DecimalType(15, 2)),
        T.StructField("age", T.IntegerType()),
    ]
)


@pytest.fixture()
def sample(spark):
    rows = [(1, "ann", "50000.10", 34), (2, "bob", "61000.00", 41), (3, None, "0.00", 19)]
    return spark.createDataFrame(
        [(a, b, c, d) for a, b, c, d in rows], "user_id long, name string, salary string, age int"
    ).select(
        "user_id", "name", F.col("salary").cast("decimal(15,2)").alias("salary"), "age"
    )


def test_csv_round_trip(spark, sample, tmp_path):
    p = str(tmp_path / "csv")
    write_csv(sample, p)
    back, rejected = split_valid(read_csv(spark, p, SCHEMA))
    assert rejected == 0
    assert sorted(r["user_id"] for r in back.collect()) == [1, 2, 3]
    assert back.schema["salary"].dataType == T.DecimalType(15, 2)


def test_json_round_trip(spark, sample, tmp_path):
    p = str(tmp_path / "json")
    write_json(sample, p)
    back, rejected = split_valid(read_json(spark, p, SCHEMA))
    assert rejected == 0
    assert back.count() == 3


def test_csv_rejects_malformed_rows(spark, tmp_path):
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part.csv").write_text(
        "user_id,name,salary,age\n"
        "1,ann,50000.10,34\n"
        "not_a_number,bob,61000.00,41\n"  # bad user_id
        "3,cid,oops,19\n"  # bad salary
    )
    df = read_csv(spark, str(p), SCHEMA)
    valid, rejected = split_valid(df)
    assert rejected == 2
    assert [r["user_id"] for r in valid.collect()] == [1]


def test_json_rejects_malformed_rows(spark, tmp_path):
    p = tmp_path / "dirty_json"
    p.mkdir()
    (p / "part.json").write_text(
        '{"user_id": 1, "name": "ann", "salary": 50000.10, "age": 34}\n'
        "this is not json\n"
    )
    valid, rejected = split_valid(read_json(spark, str(p), SCHEMA))
    assert rejected == 1
    assert valid.count() == 1


# ---------------------------------------------------------------------------
# JDBC contract (S6/S7/S8) against embedded Derby — the Derby jars ship with
# Spark itself, so this exercises the real JDBC channel with no DB server:
# window select -> staged overwrite -> partitioned read-back -> windowed
# promote with a count report (reference migrate_to_mysql.py:32-65 +
# fn_dm_data_stg_to_dm_load.sql:8-36).
# ---------------------------------------------------------------------------

import datetime as dt

from pyspark.sql import functions as F

from etl_data_spark.io.sources import promote_staging_jdbc, read_jdbc, write_jdbc


def _derby_url(tmp_path, name="db"):
    return f"jdbc:derby:{tmp_path}/{name};create=true"


def _fact(spark, n=200, year=2023):
    return spark.range(n).select(
        F.col("id").alias("fact_id"),
        (F.col("id") % 7).cast("int").alias("customer_id"),
        (F.col("id") % 100).cast("double").alias("purchase_amount"),
        F.date_add(F.lit(f"{year}-01-01").cast("date"), (F.col("id") % 300).cast("int")).alias(
            "effective_from"
        ),
        F.date_add(F.lit(f"{year}-01-01").cast("date"), (F.col("id") % 300).cast("int") + 30).alias(
            "effective_to"
        ),
    )


def test_jdbc_roundtrip_partitioned(spark, tmp_path):
    url = _derby_url(tmp_path)
    fact = _fact(spark)
    # S7: staged overwrite is idempotent (DELETE + executemany equivalent)
    write_jdbc(fact, url, "t_dm_stg_task")
    write_jdbc(fact, url, "t_dm_stg_task")

    # S6: partitioned read fans the scan out over executor connections
    back = read_jdbc(
        spark, url, "t_dm_stg_task",
        partition_column="fact_id", lower_bound=0, upper_bound=200, num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, fact.collect()))


def test_jdbc_windowed_migrate_and_promote(spark, tmp_path):
    url = _derby_url(tmp_path)
    fact = _fact(spark)

    # window select (migrate_to_mysql.py:32-42) -> staging
    window = fact.filter(
        (F.col("effective_from") >= F.lit("2023-01-01").cast("date"))
        & (F.col("effective_to") <= F.lit("2023-06-30").cast("date"))
    )
    n_window = window.count()
    write_jdbc(window, url, "t_dm_stg_task")

    # first promote creates the target; count report matches staging
    n1 = promote_staging_jdbc(
        spark, url, "t_dm_stg_task", "t_dm_task", "2023-01-01", "2023-06-30"
    )
    assert n1 == n_window
    target = read_jdbc(spark, url, "t_dm_task")
    assert target.count() == n_window

    # re-promoting the same window is idempotent (delete-then-insert)
    n2 = promote_staging_jdbc(
        spark, url, "t_dm_stg_task", "t_dm_task", "2023-01-01", "2023-06-30"
    )
    assert n2 == n_window
    assert read_jdbc(spark, url, "t_dm_task").count() == n_window

    # a second, disjoint window accumulates instead of replacing
    window2 = fact.filter(F.col("effective_from") >= F.lit("2023-07-01").cast("date"))
    write_jdbc(window2, url, "t_dm_stg_task")
    n3 = promote_staging_jdbc(
        spark, url, "t_dm_stg_task", "t_dm_task", "2023-07-01", None
    )
    assert n3 == window2.count()
    total = read_jdbc(spark, url, "t_dm_task").count()
    assert total == n_window + n3

    # the window predicate binds the STAGING side too (reference
    # fn_dm_data_stg_to_dm_load.sql:11-14, 22-35 / r8 ADVICE): with the
    # WHOLE fact table staged, promoting a window counts and inserts only
    # the window's staged rows — out-of-window leftovers in staging are
    # neither reported nor duplicated into the target
    write_jdbc(fact, url, "t_dm_stg_task")
    n4 = promote_staging_jdbc(
        spark, url, "t_dm_stg_task", "t_dm_task", "2023-07-01", None
    )
    assert n4 == n3  # only the July+ staged rows counted
    total = read_jdbc(spark, url, "t_dm_task").count()
    assert total == n_window + n3  # first window untouched, no duplicates


def test_jdbc_table_exists_is_a_catalog_probe(spark, tmp_path):
    """Existence comes from DatabaseMetaData, not from a read attempt:
    missing tables answer False (any identifier case), present tables True,
    and an unreachable database RAISES — promote_staging_jdbc must never
    read a connection failure as 'first promote' and overwrite the target
    with only the staged window."""
    from etl_data_spark.io.sources import jdbc_table_exists

    url = _derby_url(tmp_path)
    write_jdbc(_fact(spark, n=10), url, "t_dm_probe")

    assert jdbc_table_exists(spark, url, "t_dm_probe")
    assert jdbc_table_exists(spark, url, "T_DM_PROBE")  # Derby stores upper
    assert not jdbc_table_exists(spark, url, "t_dm_nope")

    # schema-qualified names resolve per part (Derby defaults to APP)
    assert jdbc_table_exists(spark, url, "app.t_dm_probe")
    assert jdbc_table_exists(spark, url, "APP.T_DM_PROBE")
    assert not jdbc_table_exists(spark, url, "nosuch_schema.t_dm_probe")

    # unreachable DB (no ;create=true, path absent) must raise, not False
    with pytest.raises(Exception):
        jdbc_table_exists(spark, f"jdbc:derby:{tmp_path}/absent_db", "t")


def test_jdbc_table_exists_matches_literally_and_scopes_schema(spark, tmp_path):
    """getTables takes LIKE patterns: `_` matches any char and a bare name
    searches every schema. Both must be neutralized (ADVICE r8) — every
    table name in this repo contains underscores, and a wildcard sibling
    or same-named table in another schema yields a false 'exists' that
    permanently blocks a legitimate first promote."""
    from etl_data_spark.io.sources import execute_jdbc_sql, jdbc_table_exists

    url = _derby_url(tmp_path)
    # wildcard sibling: every `_` position filled by a literal char
    write_jdbc(_fact(spark, n=5), url, "tXdmXwild")
    assert jdbc_table_exists(spark, url, "tXdmXwild")
    # old behavior: `_` wildcards made this probe match tXdmXwild -> True
    assert not jdbc_table_exists(spark, url, "t_dm_wild")

    # `%` in a (quoted) identifier must also be literal, not match-all
    execute_jdbc_sql(spark, url, 'CREATE TABLE "pct%name" (i INT)')
    assert jdbc_table_exists(spark, url, "pct%name")
    assert not jdbc_table_exists(spark, url, "zz%")

    # same-named table in ANOTHER schema must not satisfy a bare-name
    # probe: unqualified names scope to the connection's default schema
    # (Derby: APP), not to all schemas
    execute_jdbc_sql(spark, url, "CREATE SCHEMA elsewhere")
    execute_jdbc_sql(spark, url, "CREATE TABLE elsewhere.t_dm_only_there (i INT)")
    assert jdbc_table_exists(spark, url, "elsewhere.t_dm_only_there")
    assert not jdbc_table_exists(spark, url, "t_dm_only_there")


def test_promote_staging_sql_touches_only_the_window(spark, tmp_path, monkeypatch):
    """Server-side promote (r7 verdict item 3): after the existence probe,
    no DataFrame is involved — the windowed DELETE + INSERT...SELECT runs
    inside the database, so kept rows are never read over the JDBC channel
    and never rewritten. Proven by stubbing Spark's read/write channel to
    raise: the promote over an existing target must still succeed, with
    only the window's rows replaced."""
    import etl_data_spark.io.sources as SRC
    from etl_data_spark.io.sources import promote_staging_sql

    url = _derby_url(tmp_path)
    fact = _fact(spark)

    # bootstrap: first promote has no target -> documented fallback to the
    # Spark-writer path (creates the table)
    h1 = fact.filter(F.col("effective_to") <= F.lit("2023-06-30").cast("date"))
    write_jdbc(h1, url, "t_dm_stg_task")
    n1 = promote_staging_sql(
        spark, url, "t_dm_stg_task", "t_dm_task", None, "2023-06-30"
    )
    assert n1 == h1.count()

    # second window: stage it, then cut the Spark channel entirely
    h2 = fact.filter(F.col("effective_from") >= F.lit("2023-07-01").cast("date"))
    n_h2 = h2.count()
    write_jdbc(h2, url, "t_dm_stg_task")

    def _no_spark_channel(*a, **k):
        raise AssertionError("promote_staging_sql used Spark's JDBC channel")

    monkeypatch.setattr(SRC, "read_jdbc", _no_spark_channel)
    monkeypatch.setattr(SRC, "write_jdbc", _no_spark_channel)
    monkeypatch.setattr(SRC, "promote_staging_jdbc", _no_spark_channel)

    n2 = promote_staging_sql(
        spark, url, "t_dm_stg_task", "t_dm_task", "2023-07-01", None
    )
    assert n2 == n_h2
    # idempotent re-promote of the same window, still server-side only
    n3 = promote_staging_sql(
        spark, url, "t_dm_stg_task", "t_dm_task", "2023-07-01", None
    )
    assert n3 == n_h2

    monkeypatch.undo()
    target = read_jdbc(spark, url, "t_dm_task")
    assert target.count() == n1 + n_h2  # kept rows intact, window replaced once
    # exact content check: target == h1 union h2
    expect = sorted(map(tuple, h1.unionByName(h2).collect()))
    assert sorted(map(tuple, target.collect())) == expect

    # NULL-date rows never match the windowed DELETE (SQL three-valued
    # logic) — same keep semantics as window_replace_predicate's
    # ~coalesce(pred, False) and the reference DELETE
    from etl_data_spark.io.sources import execute_jdbc_sql

    execute_jdbc_sql(
        spark, url,
        'INSERT INTO t_dm_task ("fact_id", "customer_id", "purchase_amount", '
        '"effective_from", "effective_to") VALUES (999999, 0, 1.0, NULL, NULL)',
    )
    n4 = promote_staging_sql(
        spark, url, "t_dm_stg_task", "t_dm_task", "2023-07-01", None
    )
    assert n4 == n_h2
    target = read_jdbc(spark, url, "t_dm_task")
    assert target.count() == n1 + n_h2 + 1
    assert target.filter(F.col("fact_id") == 999999).count() == 1

    # the window binds the staging COUNT and INSERT...SELECT too
    # (reference lines 11-14/22-35; r8 ADVICE medium): stage the WHOLE
    # fact table, promote only the July+ window — out-of-window staged
    # rows are neither counted nor inserted, so the H1 window in the
    # target is not duplicated by leftovers in staging
    write_jdbc(fact, url, "t_dm_stg_task")
    monkeypatch.setattr(SRC, "read_jdbc", _no_spark_channel)
    monkeypatch.setattr(SRC, "write_jdbc", _no_spark_channel)
    monkeypatch.setattr(SRC, "promote_staging_jdbc", _no_spark_channel)
    n5 = promote_staging_sql(
        spark, url, "t_dm_stg_task", "t_dm_task", "2023-07-01", None
    )
    assert n5 == n_h2
    monkeypatch.undo()
    target = read_jdbc(spark, url, "t_dm_task")
    assert target.count() == n1 + n_h2 + 1  # unchanged: window replaced 1:1
    expect = sorted(map(tuple, h1.unionByName(h2).collect()))
    got = sorted(
        map(tuple, target.filter(F.col("fact_id") != 999999).collect())
    )
    assert got == expect


def test_ns_events_read_restores_conf_and_truncates(spark, tmp_path):
    """load_table's ns-parquet path must (a) truncate ns -> us exactly like
    DuckDB's cast and (b) restore the global nanosAsLong flag afterwards —
    the relation captures the conf at resolution, so later execution still
    works with the flag restored (no session-state leak into other reads).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_data_spark.queries import load_table

    ts = pa.array(
        [1700000000123456789, 1700000001987654999], type=pa.timestamp("ns")
    )
    t = pa.table({"event_id": pa.array([1, 2], type=pa.int64()), "ts": ts})
    pq.write_table(t, str(tmp_path / "events.parquet"))

    before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = load_table(spark, str(tmp_path), "events")
    after = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    assert after == before  # no leak

    got = {r["event_id"]: r["ts"] for r in df.collect()}
    assert got[1].microsecond == 123456  # 123456789ns -> 123456us (truncate)
    assert got[2].microsecond == 987654  # truncation, not rounding


def test_spark_written_events_dir_reads_as_timestamp(spark, tmp_path):
    """load_table must accept a DIRECTORY-style events table written by
    Spark itself (part files, INT96 physical timestamps). pyarrow surfaces
    INT96 as timestamp[ns] in the arrow schema, so a naive unit sniff would
    wrongly take the int64-nanos legacy branch and fail analysis; the sniff
    keys on the parquet PHYSICAL type instead. This is the shape any
    re-materialized events table has (scale harness, staging copies).
    """
    from etl_data_spark.queries import events_ts_unit, load_table

    src = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events.parquet")
    src.limit(100).write.mode("overwrite").parquet(out)

    assert events_ts_unit(str(tmp_path)) == "us"
    df = load_table(spark, str(tmp_path), "events")
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[
        "ts"
    ] == "timestamp"
    assert df.count() == 100


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink/source round-trip preserves schema+values, and predicate
    pushdown reaches the ORC scan like it does for parquet."""
    from etl_data_spark.io.sources import read_orc, write_orc

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    assert (
        back.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).first()[0]
        == src.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).first()[0]
    )
    plan = (
        back.filter(F.col("o_orderkey") == 42)
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderkey" in plan
