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
    fn_dm_data_stg_to_dm_load.sql:8-36: count staging IN THE WINDOW,
    DELETE target rows in the window, INSERT ... SELECT the staging rows
    in the window, report the row count — the window predicate binds all
    three statements, so staged rows outside [start_date, end_date] are
    neither counted nor promoted).

    Spark's JDBC channel has no DELETE-WHERE primitive, so the promote is
    keep ∪ staging -> overwrite, with the keep side materialized via
    ``localCheckpoint`` (lineage to the target table must be severed before
    the overwrite drops it). That materialization holds only the NON-window
    rows of the target — it rewrites the whole table, so for a large mart
    use ``promote_staging_sql`` instead, which executes the reference's
    own windowed DELETE + INSERT...SELECT server-side and never reads or
    rewrites the kept rows; this path exists for reference parity over any
    plain JDBC target and as the bootstrap that creates a missing target.
    Returns the number of staged rows promoted.
    """
    from etl_data_spark.io.writers import window_replace_predicate

    staged = read_jdbc(spark, url, staging_table, **options)
    pred = window_replace_predicate(start_date, end_date, date_col, to_col)
    if pred is not None:
        # same three-valued logic as the reference's staging WHERE: rows
        # with NULL dates never match, so they are not promoted either
        staged = staged.filter(F.coalesce(pred, F.lit(False)))
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
        keep = target.limit(0) if pred is None else target.filter(
            ~F.coalesce(pred, F.lit(False))
        )
        merged = truncate_lineage(keep).unionByName(staged)
    write_jdbc(merged, url, target_table, mode="overwrite", **options)
    return n_staged


def execute_jdbc_sql(spark: SparkSession, url: str, sql: str, **options: str) -> int:
    """Execute one DDL/DML statement server-side over a driver-side JDBC
    ``Statement``; returns the update count (0 for DDL). The statement runs
    in the database — no row crosses the JDBC channel."""
    jvm = spark._jvm
    driver = options.get("driver")
    if driver:
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    for k, v in options.items():
        if k != "driver":
            props.setProperty(k, str(v))
    conn = _jdbc_connect(jvm, url, props, driver)
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def promote_staging_sql(
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
    """Server-side staged promote: the reference's own windowed
    DELETE + INSERT ... SELECT (fn_dm_data_stg_to_dm_load.sql:17-33),
    executed INSIDE the database over one driver-side JDBC connection in a
    single transaction.

    This is the scale path ``promote_staging_jdbc`` documents as missing:
    only the window's rows are deleted and only the staged rows are
    inserted — kept rows are never read, never shipped over JDBC, and
    never rewritten, so promoting a daily window into a multi-TB mart
    touches the day, not the mart. No DataFrame is involved after the
    existence probe (contract-tested: Spark's read/write channel is
    stubbed out and the promote still succeeds).

    Window semantics match the reference procedure exactly: present
    bounds contribute ``date_col >= start`` / ``to_col <= end`` conjuncts
    (parameterized ``java.sql.Date``s — no literal formatting, no
    injection surface), applied to the target DELETE **and to the staging
    COUNT and INSERT...SELECT** — the reference windows all three
    (fn_dm_data_stg_to_dm_load.sql lines 11-14, 17-20, 22-35), so staged
    rows outside [start_date, end_date] are neither counted nor promoted
    (a re-promote of a narrower window can therefore never duplicate
    out-of-window leftovers in staging). Both bounds absent promotes
    everything; rows with NULL dates never match (SQL three-valued
    logic, same as the reference). The INSERT names the staging table's
    columns explicitly so target/staging column order never has to agree.

    The target must already exist (the reference assumes the dm schema is
    bootstrapped); a first promote falls back to ``promote_staging_jdbc``,
    which creates it through Spark's JDBC writer. Returns the number of
    staged rows promoted, i.e. the reference function's count report.
    """
    if not jdbc_table_exists(spark, url, target_table, **options):
        return promote_staging_jdbc(
            spark, url, staging_table, target_table,
            start_date, end_date, date_col, to_col, **options,
        )

    jvm = spark._jvm
    driver = options.get("driver")
    if driver:
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    for k, v in options.items():
        if k != "driver":
            props.setProperty(k, str(v))

    def sql_date(d):
        if d is None:
            return None
        return jvm.java.sql.Date.valueOf(str(d))

    conn = _jdbc_connect(jvm, url, props, driver)
    try:
        conn.setAutoCommit(False)
        # Spark's JDBC writer quotes column identifiers on CREATE TABLE, so
        # they are stored case-SENSITIVELY; quote them here the same way
        # (column args must be given in stored case, as with Spark itself).
        q = conn.getMetaData().getIdentifierQuoteString() or '"'

        def qi(ident: str) -> str:
            return q + ident.replace(q, q + q) + q

        conjuncts, params = [], []
        if start_date is not None:
            conjuncts.append(f"{qi(date_col)} >= ?")
            params.append(sql_date(start_date))
        if end_date is not None:
            conjuncts.append(f"{qi(to_col)} <= ?")
            params.append(sql_date(end_date))
        where = f" WHERE {' AND '.join(conjuncts)}" if conjuncts else ""

        def run_windowed(sql: str, query: bool = False):
            """Prepared statement with the window's Date params bound —
            the same conjuncts (and the same parameter values) serve the
            staging COUNT, the target DELETE, and the INSERT...SELECT,
            exactly as the reference binds p_start_dt/p_end_dt three
            times."""
            ps = conn.prepareStatement(sql)
            try:
                for i, p in enumerate(params, start=1):
                    ps.setDate(i, p)
                if not query:
                    return ps.executeUpdate()
                rs = ps.executeQuery()
                rs.next()
                # getLong, not getInt: a multi-TB staging count overflows
                # int32 — this is the path documented as the scale path
                n = rs.getLong(1)
                rs.close()
                return int(n)
            finally:
                ps.close()

        stmt = conn.createStatement()
        try:
            # column list from the staging table's own metadata (0-row scan)
            rs = stmt.executeQuery(f"SELECT * FROM {staging_table} WHERE 1=0")
            md = rs.getMetaData()
            cols = ", ".join(
                qi(md.getColumnName(i))
                for i in range(1, md.getColumnCount() + 1)
            )
            rs.close()

            n_staged = run_windowed(
                f"SELECT COUNT(*) FROM {staging_table}{where}", query=True
            )
            run_windowed(f"DELETE FROM {target_table}{where}")
            run_windowed(
                f"INSERT INTO {target_table} ({cols}) "
                f"SELECT {cols} FROM {staging_table}{where}"
            )
            conn.commit()
            return n_staged
        except Exception:
            conn.rollback()
            raise
        finally:
            stmt.close()
    finally:
        conn.close()


def _jdbc_connect(jvm, url: str, props, driver_class: str | None):
    """Driver-side ``java.sql.Connection``, robust to classloader quirks.

    ``DriverManager`` checks that the *caller's* classloader can see the
    driver, which can reject drivers shipped only via ``spark.jars`` with
    "No suitable driver" even though Spark's own JDBC reads on the same
    URL work. When an explicit ``driver`` class is known we fall back to
    instantiating it directly and calling ``Driver.connect`` (the SPI
    check doesn't apply there). Without an explicit driver class the jar
    must be on the *driver JVM's* classpath (``spark.driver.
    extraClassPath``), not only in ``spark.jars``.
    """
    try:
        return jvm.java.sql.DriverManager.getConnection(url, props)
    except Exception:
        if not driver_class:
            raise
        drv = (
            jvm.java.lang.Class.forName(driver_class)
            .getDeclaredConstructor()
            .newInstance()
        )
        conn = drv.connect(url, props)
        if conn is None:  # JDBC contract: wrong-URL drivers return null
            raise
        return conn


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

    ``getTables`` takes LIKE *patterns*, where ``_`` and ``%`` are
    wildcards — and ``_`` appears in every table name in this repo. Both
    parts are escaped with the driver's ``getSearchStringEscape`` when the
    driver reports one (Derby reports NONE — its metadata patterns cannot
    be escaped at all), and every returned row is then post-verified for
    LITERAL schema/name equality, so a wildcard sibling (``tXdmXwild``
    matching a ``t_dm_wild`` probe) can never yield a false "exists" that
    blocks a legitimate first promote. A missing schema part scopes the
    probe to the connection's default schema (``conn.getSchema()``) when
    the driver reports one, instead of searching every schema (where a
    same-named table in another schema also yields a false "exists").
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
    conn = _jdbc_connect(jvm, url, props, driver)
    try:
        meta = conn.getMetaData()
        esc = meta.getSearchStringEscape() or ""

        def pattern(s: str) -> str:
            if not esc:  # driver can't escape; post-filter below decides
                return s
            # escape the escape char first, then the LIKE wildcards
            for ch in (esc, "_", "%"):
                s = s.replace(ch, esc + ch)
            return s

        if not schema:
            try:
                default_schema = conn.getSchema()
            except Exception:
                default_schema = None  # driver predates JDBC 4.1 / no default
        else:
            default_schema = None
        candidates = {(schema or default_schema or None, name)}
        for case in (str.upper, str.lower):
            candidates.add(
                (case(schema) if schema else (default_schema or None), case(name))
            )
        for cand_schema, cand_name in candidates:
            rs = meta.getTables(
                None,
                pattern(cand_schema) if cand_schema else None,
                pattern(cand_name),
                None,
            )
            try:
                # patterns can over-match (wildcards in the probed name, or
                # an unescapable driver): accept only a LITERAL row match
                while rs.next():
                    if rs.getString("TABLE_NAME") != cand_name:
                        continue
                    if cand_schema and rs.getString("TABLE_SCHEM") != cand_schema:
                        continue
                    return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()
