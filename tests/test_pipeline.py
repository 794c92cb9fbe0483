"""Pipeline tests mirroring the reference's strategy (SURVEY §5):
post-condition data-quality assertions on every layer, determinism of the
generator, idempotent windowed reloads, DQ framework output shape.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_data_spark.cleanse import cleanse, date_window_filter
from etl_data_spark.dq import run_reference_dq
from etl_data_spark.generate import generate_source
from etl_data_spark.io.writers import overwrite_by_window
from etl_data_spark.pipeline import run_pipeline
from etl_data_spark.star import build_star


@pytest.fixture(scope="module")
def bronze(spark):
    return generate_source(spark, rows=1000, seed=42).cache()


@pytest.fixture(scope="module")
def silver(bronze):
    return cleanse(bronze, "2023-01-01", "2023-12-31").cache()


def test_generator_deterministic(spark, bronze):
    again = generate_source(spark, rows=1000, seed=42)
    a = sorted(map(tuple, bronze.drop("loaded_at").collect()))
    b = sorted(map(tuple, again.drop("loaded_at").collect()))
    assert a == b


def test_generator_partition_independent(spark):
    one = generate_source(spark, rows=500, seed=7, num_partitions=1)
    many = generate_source(spark, rows=500, seed=7, num_partitions=13)
    assert sorted(map(tuple, one.drop("loaded_at").collect())) == sorted(
        map(tuple, many.drop("loaded_at").collect())
    )


def test_generator_has_anomalies(bronze):
    n = bronze.count()
    assert n > 1000  # duplicates appended
    assert bronze.filter(F.col("salary") < 0).count() > 0
    assert bronze.filter(F.col("age").isNull()).count() > 0
    assert bronze.filter(F.col("effective_to") < F.col("effective_from")).count() > 0
    assert bronze.filter(F.col("product_category") == "Invalid_Category").count() > 0


def test_silver_postconditions(silver):
    """The reference's own correctness spec (test_etl.py:105-131)."""
    assert silver.filter(F.col("salary") < 0).count() == 0
    assert silver.filter((F.col("age") < 18) | (F.col("age") > 100)).count() == 0
    assert silver.filter(F.col("age").isNull()).count() == 0
    assert silver.filter(F.col("effective_to") < F.col("effective_from")).count() == 0
    assert silver.filter(F.col("user_id").isNull()).count() == 0
    assert silver.filter(
        (F.col("purchase_amount") < 0) | (F.col("purchase_amount") > 100000)
    ).count() == 0
    cats = {r[0] for r in silver.select("product_category").distinct().collect()}
    assert cats <= {"Electronics", "Clothing", "Books", "Home", "Sports", "Other"}
    stats = {r[0] for r in silver.select("customer_status").distinct().collect()}
    assert all(s == s.lower() for s in stats)


def test_silver_window_gate_uses_raw_dates(spark):
    """Rows whose RAW dates fall outside the window are excluded even if the
    repaired dates would fall inside (01_init_all.sql:132-134 semantics)."""
    rows = [
        # raw effective_from 2019 -> repaired to 2023, but raw is < start: drop
        (1, "u1", "U1", 30, 100.0, 50.0, "Books", "North", "active", 5,
         dt.date(2019, 6, 1), dt.date(2023, 6, 1), True),
        # in-window row: kept
        (2, "u2", "U2", 30, 100.0, 50.0, "Books", "North", "active", 5,
         dt.date(2023, 2, 1), dt.date(2023, 6, 1), True),
    ]
    cols = ["id", "user_id", "user_name", "age", "salary", "purchase_amount",
            "product_category", "region", "customer_status", "transaction_count",
            "effective_from", "effective_to", "current_flag"]
    df = spark.createDataFrame(rows, cols)
    out = cleanse(df, "2023-01-01", "2023-12-31")
    assert [r["id"] for r in out.collect()] == [2]


def test_effective_to_repair_reads_raw_from(spark):
    """effective_to < RAW effective_from -> raw_from + 30d, even when
    effective_from itself is being repaired (P8 evaluation-order subtlety)."""
    rows = [(1, "u1", "U1", 30, 100.0, 50.0, "Books", "North", "active", 5,
             dt.date(2023, 5, 10), dt.date(2023, 5, 1), True)]
    cols = ["id", "user_id", "user_name", "age", "salary", "purchase_amount",
            "product_category", "region", "customer_status", "transaction_count",
            "effective_from", "effective_to", "current_flag"]
    out = cleanse(spark.createDataFrame(rows, cols), None, None).first()
    assert out["effective_to"] == dt.date(2023, 6, 9)  # raw_from + 30 days


def test_star_schema(spark, silver):
    star = build_star(silver)
    assert star.dims["dim_product"].count() <= 6
    assert star.dims["dim_region"].count() <= 5
    assert star.dims["dim_status"].count() <= 4
    assert star.dims["dim_customer"].count() <= 100
    fact = star.fact
    assert fact.count() == silver.count()
    # surrogate resolution: every fact row resolves all four dims (silver
    # guarantees non-null natural keys)
    for c in ["customer_id", "product_id", "region_id", "status_id"]:
        assert fact.filter(F.col(c).isNull()).count() == 0
    # fact_id unique
    assert fact.select("fact_id").distinct().count() == fact.count()


def test_fact_scale_mode_has_no_global_sort(spark, silver):
    """Default fact-id assignment must be shuffle-free: no single-partition
    global Window sort in the fact build's physical plan (that is the opt-in
    dense mode for oracle runs only). Dims are materialized first so their
    own tiny row_number windows don't appear in the inspected plan."""
    from etl_data_spark.star import DIM_SPECS, build_fact, upsert_dim

    dims = {}
    for dim_name, id_col, key_col, source_col in DIM_SPECS:
        built = upsert_dim(None, silver, source_col, id_col, key_col)
        dims[dim_name] = spark.createDataFrame(built.collect(), built.schema)

    fact = build_fact(silver, dims)
    p = fact._jdf.queryExecution().executedPlan().toString()
    assert "monotonically_increasing_id" in p
    assert "Window" not in p and "SinglePartition" not in p

    dense = build_fact(silver, dims, dense_fact_ids=True)
    pd_ = dense._jdf.queryExecution().executedPlan().toString()
    assert "Window" in pd_  # dense mode really is the window path


def test_fact_ids_unique_across_incremental_loads(spark, silver):
    """Scale-mode ids must not collide when a second load appends with the
    max-existing offset (monotonically_increasing_id starts at 0)."""
    star1 = build_star(silver)
    star2 = build_star(silver, existing=star1)
    total = star2.fact.count()
    assert star2.fact.select("fact_id").distinct().count() == total


def test_dim_upsert_idempotent(spark, silver):
    star1 = build_star(silver)
    star2 = build_star(silver, existing=star1)
    for name in star1.dims:
        assert star2.dims[name].count() == star1.dims[name].count()
        ids = star2.dims[name].select(star2.dims[name].columns[0]).collect()
        assert len({r[0] for r in ids}) == len(ids)


def test_dq_all_pass(spark, silver):
    star = build_star(silver)
    res = run_reference_dq(spark, silver, star.fact)
    rows = {r["check_type"]: r["status"] for r in res.collect()}
    assert rows == {
        "correctness": "passed",
        "completeness": "passed",
        "consistency": "passed",
        "uniqueness": "passed",
        "validity": "passed",
        "summary": "passed",
    }


def test_dq_detects_violations(spark, silver):
    bad = silver.withColumn(
        "salary", F.when(F.col("id") % 10 == 0, -5).otherwise(F.col("salary"))
    )
    star = build_star(bad)
    res = run_reference_dq(spark, bad, star.fact)
    status = {r["check_type"]: r["status"] for r in res.collect()}
    assert status["validity"] == "failed"
    assert status["summary"] == "failed"


def test_overwrite_by_window(spark, silver, tmp_path):
    path = str(tmp_path / "t")
    n1 = overwrite_by_window(spark, silver, path, "2023-01-01", "2023-12-31")
    n2 = overwrite_by_window(spark, silver, path, "2023-01-01", "2023-12-31")
    assert n1 == n2
    stored = spark.read.parquet(path)
    assert stored.count() == silver.count()  # idempotent reload, no dup rows


def test_overwrite_by_window_keeps_null_date_rows(spark, tmp_path):
    """Rows with NULL effective dates sit outside every window: the
    reference DELETE's window predicate never matches them, so a windowed
    reload must keep them (for every bound combination)."""
    path = str(tmp_path / "t_null")
    schema = "k int, effective_from date, effective_to date"
    existing = spark.createDataFrame(
        [
            (1, dt.date(2023, 2, 1), dt.date(2023, 2, 10)),  # inside window
            (2, dt.date(2022, 1, 1), dt.date(2022, 1, 5)),  # outside window
            (3, None, dt.date(2023, 2, 10)),  # NULL from
            (4, dt.date(2023, 2, 1), None),  # NULL to
            (5, None, None),  # NULL both
        ],
        schema,
    )
    new = spark.createDataFrame([(10, dt.date(2023, 2, 2), dt.date(2023, 2, 3))], schema)

    # replaced set per bound combination, from the reference predicate
    # (start IS NULL OR eff_from >= start) AND (end IS NULL OR eff_to <= end):
    # a NULL date never satisfies a PRESENT bound, and an absent bound
    # drops its conjunct entirely.
    cases = [
        (("2023-01-01", "2023-12-31"), {1}),
        (("2023-01-01", None), {1, 4}),  # eff_to unconstrained
        ((None, "2023-12-31"), {1, 2, 3}),  # eff_from unconstrained
    ]
    for (start, end), replaced in cases:
        overwrite_by_window(spark, existing, path, None, None)  # reset
        overwrite_by_window(spark, new, path, start, end)
        kept = {r["k"] for r in spark.read.parquet(path).collect()}
        expected = ({1, 2, 3, 4, 5} - replaced) | {10}
        assert kept == expected, (start, end, kept)


def test_cleanse_to_copy_shadow_fixture(spark, bronze, silver, tmp_path):
    """Reference shadow-copy parity (01_init_all.sql:41-57,143-166 FOR
    AUTOTESTS): same transform, separate sink; the copy table's contents
    equal the silver output and the returned count matches."""
    from etl_data_spark.cleanse import cleanse_to_copy

    path = str(tmp_path / "structured_copy")
    n = cleanse_to_copy(spark, bronze, path, "2023-01-01", "2023-12-31")
    copy = spark.read.parquet(path)
    assert n == copy.count() == silver.count()
    drop = ["processed_at"]  # audit timestamp differs per run by design
    a = sorted(map(tuple, copy.drop(*drop).collect()))
    b = sorted(map(tuple, silver.drop(*drop).collect()))
    assert a == b
    # post-conditions hold on the copy (reference test_etl.py:80-103 spirit)
    assert copy.filter(F.col("salary") < 0).count() == 0
    assert copy.filter(F.col("effective_to") < F.col("effective_from")).count() == 0


def test_cli_smoke(tmp_path):
    """python -m etl_data_spark runs end-to-end and reports all-passed DQ."""
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "etl_data_spark",
            "--skip-export",
            "--rows",
            "300",
            "--warehouse",
            str(tmp_path / "wh"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "silver rows:" in proc.stdout
    assert "'summary': 'passed'" in proc.stdout


def test_full_pipeline(spark, tmp_path):
    res = run_pipeline(spark, rows=500, warehouse=str(tmp_path / "wh"))
    assert res.silver_count > 0
    assert res.exported_count == res.star.fact.count()
    assert res.dq_results.filter(F.col("status") != "passed").count() == 0


def test_date_window_filter_none_bounds(spark, silver):
    assert date_window_filter(silver, None, None).count() == silver.count()


def _month_files(root):
    """(relative path, size, mtime) for every data file under each
    part_month= dir — the byte-identity fingerprint for untouched months."""
    from pathlib import Path

    out = {}
    for d in Path(root).iterdir():
        if d.is_dir() and d.name.startswith("part_month="):
            out[d.name] = sorted(
                (str(p.relative_to(d)), p.stat().st_size, p.stat().st_mtime_ns)
                for p in d.rglob("*")
                if p.is_file()
            )
    return out


def test_overwrite_by_window_untouched_months_byte_identical(spark, tmp_path):
    """A windowed reload must not rewrite months outside the window: their
    data files keep identity (same listing, sizes, mtimes). This is the
    partition-scoped contract — at 100 TB a monthly load touches O(window),
    not the table (VERDICT r10 #1)."""
    path = str(tmp_path / "t_scoped")
    schema = "k int, effective_from date, effective_to date"
    rows = [
        (i, dt.date(2023, m, 5), dt.date(2023, m, 25))
        for m in range(1, 7)
        for i in range(m * 100, m * 100 + 10)
    ]
    existing = spark.createDataFrame(rows, schema)
    overwrite_by_window(spark, existing, path, None, None)

    before = _month_files(path)
    assert set(before) == {f"part_month=2023{m:02d}" for m in range(1, 7)}

    # reload March only
    new = spark.createDataFrame(
        [(999, dt.date(2023, 3, 10), dt.date(2023, 3, 11))], schema
    )
    n = overwrite_by_window(spark, new, path, "2023-03-01", "2023-03-31")
    assert n == 1

    after = _month_files(path)
    # every month except March: byte-identical file listing
    for m in (1, 2, 4, 5, 6):
        key = f"part_month=2023{m:02d}"
        assert after[key] == before[key], f"month {key} was rewritten"
    # March: replaced (old rows gone, new row present)
    stored = spark.read.parquet(path)
    march = {r["k"] for r in stored.filter(F.col("part_month") == 202303).collect()}
    assert march == {999}
    assert stored.count() == 51  # 5 months x 10 + 1


def test_overwrite_by_window_drops_emptied_month(spark, tmp_path):
    """A month whose rows are all replaced and that receives no new rows
    must disappear — dynamic-overwrite semantics, not append-only."""
    path = str(tmp_path / "t_empty_month")
    schema = "k int, effective_from date, effective_to date"
    existing = spark.createDataFrame(
        [
            (1, dt.date(2023, 1, 5), dt.date(2023, 1, 6)),
            (2, dt.date(2023, 2, 5), dt.date(2023, 2, 6)),
        ],
        schema,
    )
    overwrite_by_window(spark, existing, path, None, None)
    # window covers January; the batch lands in February
    new = spark.createDataFrame(
        [(3, dt.date(2023, 2, 7), dt.date(2023, 2, 8))], schema
    )
    overwrite_by_window(spark, new, path, "2023-01-01", "2023-01-31")
    stored = spark.read.parquet(path)
    assert {r["k"] for r in stored.collect()} == {2, 3}
    from pathlib import Path

    assert not (Path(path) / "part_month=202301").exists()


def test_overwrite_by_window_recovers_crashed_swap(spark, tmp_path):
    """r11 crash-safety: a reload killed between the two swap renames
    leaves a month only at its trash name; the next reload must RESTORE
    it before discovery (its kept rows exist nowhere else), and must
    clean up a post-rename-in trash leftover without touching the live
    month. Covers both the r12 dot-prefixed trash name (dot, not
    underscore: Spark hides dot-prefixed dirs, but parses an
    underscore-prefixed name containing '=' as a partition column —
    _month_trash_name's design note) and the legacy bare one (a table
    last written by an older build)."""
    from pathlib import Path

    path = str(tmp_path / "t_crash")
    schema = "k int, effective_from date, effective_to date"
    existing = spark.createDataFrame(
        [
            (1, dt.date(2023, 1, 5), dt.date(2023, 1, 6)),
            (2, dt.date(2023, 2, 5), dt.date(2023, 2, 6)),
            (3, dt.date(2023, 3, 5), dt.date(2023, 3, 6)),
            (4, dt.date(2023, 4, 5), dt.date(2023, 4, 6)),
        ],
        schema,
    )
    overwrite_by_window(spark, existing, path, None, None)

    # crash case A: month 2023-02 renamed out, never renamed back in
    feb = Path(path) / "part_month=202302"
    feb.rename(Path(path) / ".part_month=202302__replaced")
    # crash case B: month 2023-03 swapped in, trash not yet deleted
    import shutil

    shutil.copytree(
        Path(path) / "part_month=202303",
        Path(path) / ".part_month=202303__replaced",
    )
    # crash case C: legacy (pre-r12) bare trash name, live twin missing
    apr = Path(path) / "part_month=202304"
    apr.rename(Path(path) / "part_month=202304__replaced")

    new = spark.createDataFrame(
        [(10, dt.date(2023, 1, 7), dt.date(2023, 1, 8))], schema
    )
    overwrite_by_window(spark, new, path, "2023-01-01", "2023-01-31")

    kept = {r["k"] for r in spark.read.parquet(path).collect()}
    assert kept == {2, 3, 4, 10}  # Feb+Apr restored, Mar intact, Jan replaced
    assert not (Path(path) / ".part_month=202302__replaced").exists()
    assert not (Path(path) / ".part_month=202303__replaced").exists()
    assert not (Path(path) / "part_month=202304__replaced").exists()


def test_mid_swap_trash_is_invisible_to_plain_readers(spark, tmp_path):
    """ADVICE r11 (medium): a reader that lists the table BETWEEN a crash
    and the next reload's recovery must not discover the trash dir as a
    partition — the dot prefix makes Spark's file index skip it,
    so the month is neither double-counted nor does the inferred
    part_month type flip to string."""
    from pathlib import Path
    import shutil

    path = str(tmp_path / "t_mid_swap")
    schema = "k int, effective_from date, effective_to date"
    df = spark.createDataFrame(
        [
            (1, dt.date(2023, 1, 5), dt.date(2023, 1, 6)),
            (2, dt.date(2023, 2, 5), dt.date(2023, 2, 6)),
        ],
        schema,
    )
    overwrite_by_window(spark, df, path, None, None)
    # simulate the instant after rename-in, before trash delete: the
    # month exists BOTH live and at its trash name
    shutil.copytree(
        Path(path) / "part_month=202302",
        Path(path) / ".part_month=202302__replaced",
    )
    seen = spark.read.parquet(path)
    assert seen.count() == 2  # not 3: the trash replica is invisible
    assert dict(seen.dtypes)["part_month"] == "int"  # type did not flip


def test_overwrite_by_window_end_only_discovery_prunes(spark, tmp_path):
    """r11 verdict nit #1: an end-only window must still partition-prune
    the discovery scan — eff_to <= end implies month_key <= yyyymm(end)
    under the mart invariant effective_from <= effective_to. Months after
    the window's end must keep byte-identical file listings AND never be
    listed by the discovery scan's pruned plan."""
    path = str(tmp_path / "t_end_only")
    schema = "k int, effective_from date, effective_to date"
    rows = [
        (i, dt.date(2023, m, 5), dt.date(2023, m, 25))
        for m in range(1, 7)
        for i in range(m * 100, m * 100 + 5)
    ]
    overwrite_by_window(spark, spark.createDataFrame(rows, schema), path, None, None)
    before = _month_files(path)

    new = spark.createDataFrame(
        [(999, dt.date(2023, 2, 10), dt.date(2023, 2, 11))], schema
    )
    # end-only window: everything ending by Feb 28 is replaced
    n = overwrite_by_window(spark, new, path, None, "2023-02-28")
    assert n == 1
    after = _month_files(path)
    for m in (3, 4, 5, 6):
        key = f"part_month=2023{m:02d}"
        assert after[key] == before[key], f"month {key} was rewritten"
    stored = spark.read.parquet(path)
    assert stored.count() == 21  # 4 months x 5 + 1
    assert {
        r["k"] for r in stored.filter(F.col("part_month") <= 202302).collect()
    } == {999}


def test_compact_small_files_recovers_crashed_swap(spark, tmp_path):
    """r11 crash-safety: a compact killed between its two renames leaves
    the whole table only at the __pre_compact trash name; the next
    compact must restore it before reading."""
    from pathlib import Path

    from etl_data_spark.io.writers import compact_small_files

    path = str(tmp_path / "t_compact_crash")
    schema = "k int, effective_from date, effective_to date"
    df = spark.createDataFrame(
        [(i, dt.date(2023, 1 + i % 3, 5), dt.date(2023, 1 + i % 3, 6)) for i in range(30)],
        schema,
    )
    overwrite_by_window(spark, df, path, None, None)
    n = spark.read.parquet(path).count()

    Path(path).rename(Path(path + "__pre_compact"))  # crash mid-swap
    n_files = compact_small_files(spark, path)
    assert n_files >= 1
    assert spark.read.parquet(path).count() == n
    assert not Path(path + "__pre_compact").exists()
