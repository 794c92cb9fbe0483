"""File and external-system sources/sinks.

Reference parity, Spark-first:

- The reference ingests a driver-side frame row-by-row with per-row error
  skip and a count of successful inserts (reference:
  data-pipeline/src/load_data_to_db.py:19-56). Here that becomes a
  PERMISSIVE schema'd read where malformed records land in a corrupt-record
  column; ``split_valid`` returns (valid rows, reject count) without a
  second scan of the file.
- The reference's cross-DB migration fetches the whole window to the driver
  and executemany-inserts it (reference: data-pipeline/src/
  migrate_to_mysql.py:32-65) — a driver-memory cliff at any real scale.
  ``read_jdbc``/``write_jdbc`` replace it with Spark's partitioned JDBC
  channel: reads parallelized over a numeric partition column, writes
  batched per executor. ``promote_staging_jdbc`` completes the staged
  migrate (fn_dm_data_stg_to_dm_load semantics). No database server ships
  in this container, but the whole path is contract-tested against embedded
  Derby (tests/test_sources.py) using the Derby jars Spark itself bundles.

All readers take an explicit StructType — schema inference is a full extra
pass over the data at 100 TB and non-deterministic under dirty input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_data_spark.caching import pin
from etl_data_spark.caching import truncate_lineage

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """PERMISSIVE csv read: rows that fail the schema keep their raw text in
    ``_corrupt_record`` instead of killing the job."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """PERMISSIVE json-lines read with corrupt-record capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )


def split_valid(df: DataFrame) -> tuple[DataFrame, int]:
    """(valid rows without the corrupt column, number of rejected rows).

    The reject count mirrors the reference's per-row error tally
    (load_data_to_db.py:48-51) but is computed distributedly in one action.

    Spark refuses to query the corrupt column straight off a raw file scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the parsed
    batch is cached first — which the subsequent valid-row consumer wants
    anyway.
    """
    df = pin(df)
    rejected = df.filter(F.col(CORRUPT_COL).isNotNull()).count()
    valid = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return valid, rejected


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC read — same pushdown/pruning properties as parquet
    (PushedFilters + ReadSchema reach the scan); useful when the lake's
    interchange format is ORC (Hive ecosystems)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Parallel JDBC read. With a numeric ``partition_column`` + bounds the
    scan fans out over ``num_partitions`` executor-side connections; without
    them it degrades to one connection (fine for dimension tables only)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.options(**options).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    **options: str,
) -> None:
    """Executor-parallel batched JDBC write (replaces the reference's
    driver-side executemany staging load, migrate_to_mysql.py:56-65)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**options)
        .mode(mode)
        .save()
    )


def promote_staging_jdbc(
    spark: SparkSession,
    url: str,
    staging_table: str,
    target_table: str,
    start_date=None,
    end_date=None,
    date_col: str = "effective_from",
    to_col: str = "effective_to",
    **options: str,
) -> int:
    """Staging -> target windowed promote over JDBC (reference
    fn_dm_data_stg_to_dm_load.sql:8-36: count staging, DELETE target rows in
    the window, INSERT ... SELECT from staging, report the row count).

    Spark's JDBC channel has no DELETE-WHERE primitive, so the promote is
    keep ∪ staging -> overwrite, with the keep side materialized via
    ``localCheckpoint`` (lineage to the target table must be severed before
    the overwrite drops it). That materialization holds only the NON-window
    rows of the target — for a true 100 TB deployment the promote would run
    as server-side SQL through the warehouse connector instead; this path
    exists for reference parity over any plain JDBC target. Returns the
    number of staged rows promoted.
    """
    from etl_data_spark.io.writers import window_replace_predicate

    staged = read_jdbc(spark, url, staging_table, **options)
    n_staged = staged.count()

    # Existence is probed EXPLICITLY against the JDBC catalog
    # (DatabaseMetaData.getTables), never inferred from a failed read: a
    # transient network/auth/scan failure on an EXISTING target must abort
    # the promote, not be mistaken for "no target yet" and overwrite the
    # table with only the staged window (losing every kept row). Any
    # exception from the probe or the target read propagates.
    if not jdbc_table_exists(spark, url, target_table, **options):
        # first promote: target table doesn't exist yet
        merged = staged
    else:
        target = read_jdbc(spark, url, target_table, **options)
        pred = window_replace_predicate(start_date, end_date, date_col, to_col)
        keep = target.limit(0) if pred is None else target.filter(
            ~F.coalesce(pred, F.lit(False))
        )
        merged = truncate_lineage(keep).unionByName(staged)
    write_jdbc(merged, url, target_table, mode="overwrite", **options)
    return n_staged


def jdbc_table_exists(
    spark: SparkSession, url: str, table: str, **options: str
) -> bool:
    """True iff ``table`` exists in the database behind ``url``, probed via
    ``DatabaseMetaData.getTables`` on a direct driver-side connection.

    This is a *catalog* probe, not a read attempt — it can only return
    False when the database answered and the table genuinely is not there.
    Connection or metadata failures raise, so callers (``promote_staging_
    jdbc``) never confuse a flaky endpoint with a missing table. Unquoted
    identifiers are matched case-insensitively (Derby/Oracle store them
    uppercase, Postgres lowercase); a ``schema.table`` name is split and
    matched per part.
    """
    jvm = spark._jvm
    driver = options.get("driver")
    if driver:
        # make sure a non-SPI driver is registered before getConnection
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    for k, v in options.items():
        if k != "driver":
            props.setProperty(k, str(v))
    schema, _, name = table.rpartition(".")
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        meta = conn.getMetaData()
        candidates = {(schema or None, name)}
        candidates.add(((schema or "").upper() or None, name.upper()))
        candidates.add(((schema or "").lower() or None, name.lower()))
        for cand_schema, cand_name in candidates:
            rs = meta.getTables(None, cand_schema, cand_name, None)
            try:
                if rs.next():
                    return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()
