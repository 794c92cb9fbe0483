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
    """Run the oracle SQL and return (cols, rows, risky_cols).

    Results are fetched through Arrow, not fetchall(): Arrow preserves
    DuckDB's *physical* output types (HUGEINT -> decimal128(38,0),
    DECIMAL(p,s) -> decimal128), which is the layer where the driver's
    typed value-hash diverged in rounds 3-4 while fetchall() silently
    coerced everything to plain Python ints. ``risky_cols`` lists output
    columns whose physical type is decimal/hugeint — a driver-hash hazard
    even when values match, because different fetch layers render them
    differently (Decimal('123.40') vs float 123.4 vs int).
    """
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    tbl = con.execute(sql).fetch_arrow_table()
    cols = list(tbl.column_names)
    risky = [
        f"{name}:{typ}"
        for name, typ in zip(tbl.column_names, tbl.schema.types)
        if "decimal" in str(typ)
    ]
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows, risky


def _norm(v):
    # Driver-strict canonicalization: values are compared as (type-tag,
    # exact value) pairs — no float rounding, no Decimal->float degradation.
    # A Spark BIGINT vs DuckDB HUGEINT/DECIMAL output, or a last-ulp float
    # divergence, must surface HERE, not in the driver's typed value-hash
    # (the round-3/4 tpch_q12/value_histogram/moments_merge failure class).
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(("null",) if x is None else _norm(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("by", bytes(v))
    return ("s", str(v)) if isinstance(v, str) else ("o", repr(v))


def _key(row):
    # (is_null, value) cells keep rows sortable when NULLs appear (e.g. the
    # unmatched side of a full outer join)
    out = []
    for x in row:
        if x is None:
            out.append((1, ("null",)))
        elif isinstance(x, float) and math.isnan(x):
            out.append((0, ("f", "nan")))
        else:
            out.append((0, _norm(x)))
    return tuple(out)


def compare(spark_df, sf_dir: str, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems = []
    o_cols, o_rows, o_risky = run_oracle(sf_dir, sql)
    s_rows_raw = spark_df.collect()
    s_cols = spark_df.columns

    # Driver-hash type lint: decimal-physical outputs render differently
    # across fetch layers (Arrow Decimal vs pandas float64 vs fetchall int)
    # — the exact class behind the r3/r4 tpch_q12 / value_histogram /
    # moments_merge hash mismatches. CAST to BIGINT/DOUBLE on BOTH sides.
    if o_risky:
        problems.append(f"oracle emits decimal/hugeint-typed columns: {o_risky}")
    s_risky = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if "decimal" in f.dataType.simpleString()
    ]
    if s_risky:
        problems.append(f"spark emits decimal-typed columns: {s_risky}")

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
