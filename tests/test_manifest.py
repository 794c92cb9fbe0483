"""Manifest-pointer tables (io/manifest.py): the object-store-safe
windowed reload — immutable versioned data dirs + immutable JSON
manifests + a single ``_current`` pointer flip. The r11 verdict's ask:
prove a reader resolving MID-SWAP sees the complete old table or the
complete new table, never a missing month."""

import datetime as dt
import json
from pathlib import Path

from pyspark.sql import functions as F

from etl_data_spark.io.manifest import (
    manifest_gc,
    manifest_overwrite_by_window,
    manifest_read,
    manifest_write_full,
)

SCHEMA = "k int, effective_from date, effective_to date"


def _rows(months, per_month=5):
    return [
        (m * 100 + i, dt.date(2023, m, 5), dt.date(2023, m, 25))
        for m in months
        for i in range(per_month)
    ]


def test_full_write_read_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(_rows([1, 2, 3]), SCHEMA)
    n = manifest_write_full(df, root)
    assert n == 15
    got = manifest_read(spark, root)
    assert got.count() == 15
    assert {r[0] for r in got.select("part_month").distinct().collect()} == {
        202301,
        202302,
        202303,
    }


def test_manifest_read_prunes_at_the_manifest(spark, tmp_path):
    """months= restricts the read to the named partitions' directories —
    proven by physically DELETING every other month's directory: the
    pruned read must still succeed (nothing else is listed or opened)."""
    import shutil

    root = str(tmp_path / "t_prune")
    manifest_write_full(spark.createDataFrame(_rows([1, 2, 3]), SCHEMA), root)
    manifest = json.loads(
        (
            Path(root)
            / "_manifests"
            / (Path(root) / "_current").read_text().strip()
        ).read_text()
    )
    for key, rel in manifest["months"].items():
        if key != "202302":
            shutil.rmtree(Path(root) / rel)
    got = manifest_read(spark, root, months={202302})
    assert got.count() == 5
    assert {r["k"] // 100 for r in got.collect()} == {2}


def test_windowed_reload_semantics_and_zero_copy_carryover(spark, tmp_path):
    """Same window semantics as overwrite_by_window, plus the manifest
    win: untouched months carry over BY REFERENCE (identical manifest
    entries, byte-identical files) — zero data movement outside the
    window."""
    root = str(tmp_path / "t_win")
    manifest_write_full(
        spark.createDataFrame(_rows([1, 2, 3, 4]), SCHEMA), root
    )
    before = json.loads(
        (
            Path(root)
            / "_manifests"
            / (Path(root) / "_current").read_text().strip()
        ).read_text()
    )["months"]
    listing_before = {
        m: sorted(
            (p.name, p.stat().st_size, p.stat().st_mtime_ns)
            for p in (Path(root) / before[m]).iterdir()
            if p.name.endswith(".parquet")
        )
        for m in before
    }

    new = spark.createDataFrame(
        [(999, dt.date(2023, 2, 10), dt.date(2023, 2, 11))], SCHEMA
    )
    n = manifest_overwrite_by_window(
        spark, new, root, "2023-02-01", "2023-02-28"
    )
    assert n == 1

    after = json.loads(
        (
            Path(root)
            / "_manifests"
            / (Path(root) / "_current").read_text().strip()
        ).read_text()
    )["months"]
    for m in ("202301", "202303", "202304"):
        assert after[m] == before[m], f"month {m} was rewritten"
        listing_now = sorted(
            (p.name, p.stat().st_size, p.stat().st_mtime_ns)
            for p in (Path(root) / after[m]).iterdir()
            if p.name.endswith(".parquet")
        )
        assert listing_now == listing_before[m]
    assert after["202302"] != before["202302"]

    got = manifest_read(spark, root)
    assert got.count() == 16  # 3 x 5 + 1
    feb = {r["k"] for r in got.filter(F.col("part_month") == 202302).collect()}
    assert feb == {999}


def test_emptied_month_drops_out(spark, tmp_path):
    root = str(tmp_path / "t_empty")
    manifest_write_full(spark.createDataFrame(_rows([1, 2]), SCHEMA), root)
    new = spark.createDataFrame(
        [(7, dt.date(2023, 2, 7), dt.date(2023, 2, 8))], SCHEMA
    )
    manifest_overwrite_by_window(spark, new, root, "2023-01-01", "2023-01-31")
    got = manifest_read(spark, root)
    assert {r[0] for r in got.select("part_month").distinct().collect()} == {
        202302
    }
    assert got.count() == 6


def test_null_date_rows_survive_every_window(spark, tmp_path):
    """Reference DELETE semantics: a NULL date never satisfies a present
    bound (mirrors test_overwrite_by_window_keeps_null_date_rows)."""
    root = str(tmp_path / "t_null")
    existing = spark.createDataFrame(
        [
            (1, dt.date(2023, 2, 1), dt.date(2023, 2, 10)),
            (2, dt.date(2022, 1, 1), dt.date(2022, 1, 5)),
            (3, None, dt.date(2023, 2, 10)),
            (4, dt.date(2023, 2, 1), None),
            (5, None, None),
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [(10, dt.date(2023, 2, 2), dt.date(2023, 2, 3))], SCHEMA
    )
    cases = [
        (("2023-01-01", "2023-12-31"), {1}),
        (("2023-01-01", None), {1, 4}),
        ((None, "2023-12-31"), {1, 2, 3}),
    ]
    for (start, end), replaced in cases:
        manifest_write_full(existing, root)
        manifest_overwrite_by_window(spark, new, root, start, end)
        kept = {r["k"] for r in manifest_read(spark, root).collect()}
        assert kept == ({1, 2, 3, 4, 5} - replaced) | {10}, (start, end)


def test_mid_swap_reader_sees_old_or_new_never_missing(spark, tmp_path):
    """THE commit-safety property (r11 verdict #7): at every observable
    intermediate state of a reload — new data dir written, new manifest
    written, pointer flipped, pointer torn/deleted — a reader resolves a
    COMPLETE table state (the old or the new), never a missing month and
    never a partial mix."""
    root = str(tmp_path / "t_swap")
    manifest_write_full(spark.createDataFrame(_rows([1, 2]), SCHEMA), root)

    def snapshot():
        got = manifest_read(spark, root)
        months = {
            r[0] for r in got.select("part_month").distinct().collect()
        }
        return months, got.count()

    old_state = ({202301, 202302}, 10)
    new_rows = spark.createDataFrame(
        [(999, dt.date(2023, 2, 10), dt.date(2023, 2, 11))], SCHEMA
    )

    # state A: mid-reload, new version dir fully written but no new
    # manifest yet (simulated: a full reload's write phase) — emulate by
    # hand-writing the data dir the way the writer would
    from etl_data_spark.io.writers import with_month_key

    with_month_key(new_rows).write.partitionBy("part_month").parquet(
        str(Path(root) / "data" / "v000099")
    )
    assert snapshot() == old_state  # invisible until a manifest names it

    # run the real reload; state B: after commit
    manifest_overwrite_by_window(
        spark, new_rows, root, "2023-02-01", "2023-02-28"
    )
    new_state = ({202301, 202302}, 6)
    assert snapshot() == new_state

    # state C: pointer object deleted (worst-case torn PUT on local FS) —
    # fallback resolves the highest complete manifest: still the new state
    (Path(root) / "_current").unlink()
    assert snapshot() == new_state

    # state D: pointer torn to garbage — same fallback
    (Path(root) / "_current").write_text("manifest-9999")
    assert snapshot() == new_state

    # state E: torn TOP manifest (writer crashed mid-manifest-write,
    # pre-flip): reader walks back to the last complete one — the new
    # state, never an error, never a partial table
    (Path(root) / "_manifests" / "manifest-000042.json").write_text(
        '{"version": 42, "mon'
    )
    assert snapshot() == new_state


def test_gc_reclaims_unreferenced_versions(spark, tmp_path):
    root = str(tmp_path / "t_gc")
    manifest_write_full(spark.createDataFrame(_rows([1, 2]), SCHEMA), root)
    for day in (10, 11, 12):
        new = spark.createDataFrame(
            [(day, dt.date(2023, 1, day), dt.date(2023, 1, day))], SCHEMA
        )
        manifest_overwrite_by_window(
            spark, new, root, "2023-01-01", "2023-01-31"
        )
    assert len(list((Path(root) / "data").iterdir())) == 4
    deleted = manifest_gc(spark, root, keep=2)
    assert deleted >= 1
    # current table still fully readable after gc
    got = manifest_read(spark, root)
    assert got.count() == 6  # Feb's 5 + the last reload's 1
    # only the kept manifests remain (ignore Hadoop local-FS .crc sidecars)
    manifests = [
        p
        for p in (Path(root) / "_manifests").iterdir()
        if p.name.startswith("manifest-")
    ]
    assert len(manifests) == 2


def test_concurrent_writer_collision_fails_loudly(spark, tmp_path):
    """Two overlapping writers both compute version max+1; the second
    manifest create must RAISE (overwrite=False), never silently replace
    the winner's immutable manifest and drop its months (r13 fix)."""
    import pytest

    from etl_data_spark.io import manifest as M

    root = str(tmp_path / "t")
    df = spark.createDataFrame(_rows([1]), SCHEMA)
    manifest_write_full(df, root)
    winner_text = (
        Path(root) / "_manifests" / "manifest-000001.json"
    ).read_text()
    # simulate the race: the loser listed versions BEFORE the winner
    # published v1, so it too computes next version = 1
    stale = M._list_manifest_versions
    M._list_manifest_versions = lambda spark, root: []
    try:
        with pytest.raises(Exception) as exc:
            manifest_write_full(df, root)
    finally:
        M._list_manifest_versions = stale
    assert "exist" in str(exc.value).lower() or "manifest-000001" in str(
        exc.value
    )
    # the winner's manifest was NOT clobbered
    assert (
        Path(root) / "_manifests" / "manifest-000001.json"
    ).read_text() == winner_text
