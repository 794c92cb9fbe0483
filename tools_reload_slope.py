#!/usr/bin/env python3
"""Measure that a windowed reload costs O(window), not O(table).

VERDICT r10 #1 done-criterion: after the partition-scoped rewrite of
``overwrite_by_window`` (io/writers.py), the reload of a fixed one-month
window must stay ~flat as the TABLE grows (more untouched months), and
grow with the WINDOW at a fixed table size. The pre-r11 implementation
read + rewrote the whole table, so its first sweep scaled linearly.

Two sweeps over synthetic month-partitioned tables (R rows per month):

1. table-size sweep: months = 6 / 12 / 24, reload ONE month;
2. window-size sweep: months = 12 fixed, reload 1 / 3 / 6 months.

Prints one markdown table per sweep (wall seconds, median of REPS runs),
ready to paste into SCALE.md §3.

Usage: python3 tools_reload_slope.py [rows_per_month] [reps]
"""

from __future__ import annotations

import datetime as dt
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _month_df(spark, year_month_index: int, rows: int, seed_tag: int):
    """One synthetic month of data: rows spread over the month's days."""
    y, m = 2020 + year_month_index // 12, 1 + year_month_index % 12
    start = dt.date(y, m, 1)
    return (
        spark.range(rows)
        .select(
            (F.col("id") + seed_tag * 10_000_000).alias("k"),
            F.date_add(F.lit(start), (F.col("id") % 28).cast("int")).alias(
                "effective_from"
            ),
            F.date_add(F.lit(start), (F.col("id") % 28).cast("int")).alias(
                "effective_to"
            ),
            F.rand(seed=seed_tag).alias("v"),
        )
    )


def _build_table(spark, path: str, months: int, rows: int) -> None:
    from etl_data_spark.io.writers import write_partitioned

    df = _month_df(spark, 0, rows, 0)
    for i in range(1, months):
        df = df.unionByName(_month_df(spark, i, rows, i))
    write_partitioned(df, path)


def _reload(spark, path: str, first_month: int, n_months: int, rows: int) -> float:
    """Time one windowed reload covering n_months starting at first_month."""
    from etl_data_spark.io.writers import overwrite_by_window

    new = _month_df(spark, first_month, rows, 900 + first_month)
    for i in range(1, n_months):
        new = new.unionByName(_month_df(spark, first_month + i, rows, 900 + first_month + i))
    y0, m0 = 2020 + first_month // 12, 1 + first_month % 12
    last = first_month + n_months - 1
    y1, m1 = 2020 + last // 12, 1 + last % 12
    end_next = dt.date(y1 + m1 // 12, m1 % 12 + 1, 1)
    t0 = time.perf_counter()
    overwrite_by_window(
        spark,
        new,
        path,
        dt.date(y0, m0, 1),
        end_next - dt.timedelta(days=1),
    )
    return time.perf_counter() - t0


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from etl_data_spark import get_spark

    spark = get_spark(app_name="reload-slope")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"rows/month = {rows}, reps = {reps} (median reported)\n")

    print("| months in table | window | table rows | reload sec |")
    print("|---|---|---|---|")
    for months in (6, 12, 24):
        root = tempfile.mkdtemp(prefix="reload_slope_")
        path = f"{root}/t"
        try:
            _build_table(spark, path, months, rows)
            ts = [_reload(spark, path, months // 2, 1, rows) for _ in range(reps)]
            print(
                f"| {months} | 1 month | {months * rows:,} | "
                f"{statistics.median(ts):.2f} |"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    print()
    print("| months in table | window | window rows | reload sec |")
    print("|---|---|---|---|")
    for win in (1, 3, 6):
        root = tempfile.mkdtemp(prefix="reload_slope_")
        path = f"{root}/t"
        try:
            _build_table(spark, path, 12, rows)
            ts = [_reload(spark, path, 3, win, rows) for _ in range(reps)]
            print(
                f"| 12 | {win} month(s) | {win * rows:,} | "
                f"{statistics.median(ts):.2f} |"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
