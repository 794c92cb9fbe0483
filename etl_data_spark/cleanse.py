"""Bronze -> silver cleansing transform.

Reimplements the reference's ETL function ``fn_etl_data_load`` (reference:
sql/init/01_init_all.sql:63-141) as a pure DataFrame -> DataFrame function.
All rules are native Column expressions — no UDFs — so Catalyst folds the
whole projection into one whole-stage-codegen'd select and filters push down
to the parquet scan.

Two semantics subtleties carried over exactly:

1. The silver gate filter (01_init_all.sql:132-134) reads the **raw** source
   date columns, not the repaired ones — the WHERE clause of an
   INSERT..SELECT sees the source table.
2. The ``effective_to`` repair (01_init_all.sql:121-129) compares against the
   **raw** ``effective_from`` (SQL SELECT-clause aliasing does not rebind
   within a select list). Both branches are computed from raw inputs in a
   single select here, never via chained withColumn.

Known semantic hole, reproduced faithfully: for a row with raw
``effective_from`` < 2020-01-01 AND ``effective_to`` < ``effective_from``,
the from-repair jumps to 2023-01-01 while the to-repair lands at raw
``effective_from`` + 30 days — yielding ``effective_to < effective_from`` in
the output. The reference never observes this because its date-window gate
(start >= 2023-01-01) excludes pre-2020 rows before the rules run; with the
gate disabled the DQ3 consistency check is the guard (it flags exactly such
rows). Property-tested in tests/test_properties.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_data_spark.schemas import PRODUCT_CATEGORIES

DateLike = "dt.date | str | None"


def date_window_filter(
    df: DataFrame,
    start_date: dt.date | str | None,
    end_date: dt.date | str | None,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
) -> DataFrame:
    """Optional [start, end] window: a NULL bound disables that side.

    Mirrors the ``(p IS NULL OR col >= p)`` idiom (reference:
    init_database.py:283-284; migrate_to_mysql.py:37-38) — but builds the
    predicate driver-side so Catalyst sees a plain pushable comparison
    instead of a disjunction it can't prune partitions with.
    """
    if start_date is not None:
        df = df.filter(F.col(from_col) >= F.lit(start_date).cast("date"))
    if end_date is not None:
        df = df.filter(F.col(to_col) <= F.lit(end_date).cast("date"))
    return df


def cleanse_columns() -> dict[str, Column]:
    """The seven CASE rewrites (01_init_all.sql:84-129), as named expressions."""
    age = F.col("age")
    salary = F.col("salary")
    purchase = F.col("purchase_amount")
    category = F.col("product_category")
    status = F.col("customer_status")
    txn = F.col("transaction_count")
    eff_from = F.col("effective_from")
    eff_to = F.col("effective_to")

    return {
        "age": (
            F.when(age.isNull(), 25)
            .when(age < 18, 18)
            .when(age > 100, 100)
            .otherwise(age)
            .cast("int")
        ),
        "salary": (
            F.when(salary < 0, 0)
            .when(salary > 1000000, 1000000)
            .otherwise(F.round(salary, 2))
            .cast("decimal(15,2)")
        ),
        "purchase_amount": (
            F.when(purchase < 0, 0)
            .when(purchase > 100000, 100000)
            .otherwise(F.round(purchase, 2))
            .cast("decimal(15,2)")
        ),
        "product_category": (
            F.when(~category.isin(PRODUCT_CATEGORIES), "Other").otherwise(category)
        ),
        "customer_status": (
            F.when(status.isNull(), "unknown").otherwise(F.lower(status))
        ),
        "transaction_count": (
            F.when(txn < 0, 0).when(txn > 1000, 1000).otherwise(txn).cast("int")
        ),
        "effective_from": (
            F.when(eff_from < F.lit("2020-01-01").cast("date"), F.lit("2023-01-01").cast("date"))
            .otherwise(eff_from)
        ),
        # NB: compares/offsets against the RAW effective_from by design.
        "effective_to": (
            F.when(eff_to < eff_from, F.date_add(eff_from, 30))
            .when(eff_to > F.lit("2024-12-31").cast("date"), F.lit("2024-12-31").cast("date"))
            .otherwise(eff_to)
        ),
    }


def cleanse(
    bronze: DataFrame,
    start_date: dt.date | str | None = "2023-01-01",
    end_date: dt.date | str | None = "2023-12-31",
) -> DataFrame:
    """Cleanse bronze rows into the silver shape for one date window.

    Filter first (on raw columns, incl. ``user_id IS NOT NULL`` —
    01_init_all.sql:132-134), then rewrite columns in ONE select so every
    rule sees raw inputs. Appends the ``processed_at`` audit column
    (01_init_all.sql:37).
    """
    gated = date_window_filter(bronze, start_date, end_date).filter(
        F.col("user_id").isNotNull()
    )
    rules = cleanse_columns()
    cols = [
        F.col("id"),
        F.col("user_id"),
        F.col("user_name"),
        rules["age"].alias("age"),
        rules["salary"].alias("salary"),
        rules["purchase_amount"].alias("purchase_amount"),
        rules["product_category"].alias("product_category"),
        F.col("region"),
        rules["customer_status"].alias("customer_status"),
        rules["transaction_count"].alias("transaction_count"),
        rules["effective_from"].alias("effective_from"),
        rules["effective_to"].alias("effective_to"),
        F.col("current_flag"),
        F.current_timestamp().alias("processed_at"),
    ]
    return gated.select(*cols)


def cleanse_to_copy(
    spark,
    bronze: DataFrame,
    copy_path: str,
    start_date: dt.date | str | None = "2023-01-01",
    end_date: dt.date | str | None = "2023-12-31",
) -> int:
    """Shadow-copy test fixture: run the full cleanse and persist the result
    to the structured-COPY table, returning the processed row count.

    Parity with the reference's ``fn_etl_data_load_test`` +
    ``t_sql_source_structured_copy`` (sql/init/01_init_all.sql:41-57,143-166,
    flagged FOR AUTOTESTS): identical transform, separate sink, so tests can
    assert post-conditions without touching the production silver table.
    Delete-then-insert of the window becomes a parquet overwrite of the copy
    table (the copy is always a single test window in the reference too).
    """
    silver = cleanse(bronze, start_date, end_date)
    silver.write.mode("overwrite").parquet(copy_path)
    return spark.read.parquet(copy_path).count()
