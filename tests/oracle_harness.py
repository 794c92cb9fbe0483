"""Local mimic of the driver's duckdb-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables, then
compares row count, column names, and order-insensitive values. Used by
tests so oracle mismatches surface locally before the driver's gate.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from etl_data_spark.queries import TABLES


def run_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def _key(row):
    # (is_null, value) cells keep rows sortable when NULLs appear (e.g. the
    # unmatched side of a full outer join)
    out = []
    for x in row:
        if x is None:
            out.append((1, ""))
        elif isinstance(x, float) and math.isnan(x):
            out.append((0, "NaN"))
        else:
            out.append((0, _norm(x)))
    return tuple(out)


def compare(spark_df, sf_dir: str, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems = []
    o_cols, o_rows = run_oracle(sf_dir, sql)
    s_rows_raw = spark_df.collect()
    s_cols = spark_df.columns

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows_raw) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows_raw)} oracle={len(o_rows)}")

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    s_set = sorted(_key([r[i] for i in order]) for r in s_rows_raw)
    o_set = sorted(_key([r[i] for i in o_order]) for r in o_rows)
    if s_set != o_set:
        diff_s = [r for r in s_set if r not in o_set][:3]
        diff_o = [r for r in o_set if r not in s_set][:3]
        problems.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
    return problems
