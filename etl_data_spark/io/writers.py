"""Storage writers: partitioned parquet + idempotent window replacement.

The reference's incremental story is delete-then-insert of a ``[start, end]``
date window (reference: sql/init/01_init_all.sql:72-73,110-111; sql/dm/
s_sql_dm/function/fn_dm_data_stg_to_dm_load.sql:17-19). On Delta that is
``replaceWhere``; on plain parquet (all this container has) we implement
overwrite-by-predicate as read-keep + union + rewrite, but partition-pruned:
tables are written partitioned by a month key derived from
``effective_from``, so both the keep-scan and downstream window queries touch
only the affected partitions. That partitioning is also the substitute for
the reference's B-tree date indexes (01_init_all.sql:59-60) — at 100 TB,
partition pruning + parquet min/max row-group stats serve the same
access-path role.
"""

from __future__ import annotations

import datetime as dt
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MONTH_KEY = "part_month"


def window_replace_predicate(
    start_date: dt.date | str | None,
    end_date: dt.date | str | None,
    date_col: str = "effective_from",
    to_col: str = "effective_to",
) -> F.Column | None:
    """The reference DELETE's window predicate
    ``(start IS NULL OR eff_from >= start) AND (end IS NULL OR eff_to <= end)``
    with absent bounds dropping their conjunct. Returns None when both
    bounds are absent (the caller replaces everything). A row with a NULL
    date under a present bound yields NULL — callers must keep such rows
    via ``~coalesce(pred, False)``, exactly like the reference DELETE which
    never matches NULL dates.
    """
    if start_date is None and end_date is None:
        return None
    if start_date is not None and end_date is not None:
        return (F.col(date_col) >= F.lit(start_date).cast("date")) & (
            F.col(to_col) <= F.lit(end_date).cast("date")
        )
    if start_date is not None:
        return F.col(date_col) >= F.lit(start_date).cast("date")
    return F.col(to_col) <= F.lit(end_date).cast("date")


def with_month_key(df: DataFrame, date_col: str = "effective_from") -> DataFrame:
    """Derive the partition column: yyyyMM int of the date column."""
    return df.withColumn(
        MONTH_KEY, (F.year(date_col) * 100 + F.month(date_col)).cast("int")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    date_col: str = "effective_from",
    mode: str = "overwrite",
) -> None:
    """Write a table partitioned by month-of(date_col) for pruning."""
    with_month_key(df, date_col).write.mode(mode).partitionBy(MONTH_KEY).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(MONTH_KEY)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_files_per_partition: int = 1,
) -> int:
    """Rewrite a (possibly month-partitioned) parquet table into
    ``target_files_per_partition`` files per partition.

    Streaming foreachBatch appends and repeated window reloads accumulate
    small files; at scale small files destroy scan throughput (one task +
    one object-store request each). Returns the number of data files after
    compaction. The rewrite is partition-parallel and preserves the month
    key so pruning is unaffected.
    """
    df = spark.read.parquet(path)
    has_month = MONTH_KEY in df.columns
    tmp = str(Path(path).with_name(Path(path).name + "__tmp_compact"))
    writer = (
        df.repartition(target_files_per_partition, MONTH_KEY)
        if has_month
        else df.coalesce(target_files_per_partition)
    )
    w = writer.write.mode("overwrite")
    if has_month:
        w = w.partitionBy(MONTH_KEY)
    w.parquet(tmp)
    shutil.rmtree(path)
    Path(tmp).rename(path)
    return sum(1 for p in Path(path).rglob("*.parquet"))


def overwrite_by_window(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    start_date: dt.date | str | None,
    end_date: dt.date | str | None,
    date_col: str = "effective_from",
    to_col: str = "effective_to",
) -> int:
    """Idempotent windowed load: replace [start, end] rows, keep the rest.

    Returns the number of rows written for the window (the reference reports
    ROW_COUNT after its INSERT, 01_init_all.sql:136-139).

    With dynamic partition overwrite this only rewrites partitions that can
    contain window rows; untouched months are left as-is — the keep-side
    read is partition-pruned by the same month key.
    """
    target = Path(path)
    n_new = new_rows.count()

    if not target.exists():
        write_partitioned(new_rows, path, date_col)
        return n_new

    existing = spark.read.parquet(path).drop(MONTH_KEY)
    window_pred = window_replace_predicate(start_date, end_date, date_col, to_col)
    if window_pred is None:
        # unbounded window replaces everything (reference DELETE with both
        # params NULL deletes all rows)
        keep = existing.limit(0)
    else:
        # A row is REPLACED only when it provably falls inside the window;
        # any NULL in the compared date columns makes the predicate NULL,
        # and ~coalesce(pred, false) keeps such rows — matching the
        # reference DELETE, which never matches rows with NULL dates.
        keep = existing.filter(~F.coalesce(window_pred, F.lit(False)))

    merged = keep.unionByName(new_rows)
    tmp = str(target.with_name(target.name + "__tmp_rewrite"))
    write_partitioned(merged, tmp, date_col)
    shutil.rmtree(path)
    Path(tmp).rename(path)
    return n_new
