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
