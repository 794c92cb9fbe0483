"""Change-data-capture and upsert operators.

The reference's whole load path is truncate-and-reload plus a staged
MySQL export (``data-pipeline/src/load_data_to_db.py``,
``migrate_to_mysql.py``);
at 100 TB a reload is not an option, so this module provides the
incremental alternatives a warehouse actually runs:

- ``snapshot_diff``   — diff two table snapshots into I/U/D change rows
  (the "change data feed" a lakehouse derives between versions).
- ``merge_upsert``    — MERGE semantics (source wins) over immutable files.
- ``apply_scd2``      — fold a change feed into slowly-changing-dimension
  type-2 history rows (effective_from / effective_to / is_current).

Scale notes: every operator here is one join or one window over the key —
no driver-side state. For repeated diffs/merges at 100 TB, write both
snapshots bucketed by the key (``io/writers.py::write_bucketed``) so the
join is shuffle-free; AQE handles skewed keys otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change rows between two snapshots: op ∈ ('I','U','D').

    Inserts are keys only in ``new``, deletes only in ``old``, updates are
    keys in both where any compared column differs (null-safe). Unchanged
    rows are dropped — the output is the minimal change feed that replays
    ``old`` into ``new``.

    One full-outer join on the key; both sides project only key + compared
    columns, so the shuffle carries the minimum payload.
    """
    compare = compare_cols or [
        c for c in old.columns if c not in keys and c in new.columns
    ]
    o = old.select(*keys, *compare)
    n = new.select(*keys, *compare)
    o = o.select(*[F.col(c).alias(f"__o_{c}") for c in o.columns])
    n = n.select(*[F.col(c).alias(f"__n_{c}") for c in n.columns])

    cond = [F.col(f"__o_{k}") == F.col(f"__n_{k}") for k in keys]
    joined = o.join(n, cond, "full_outer")

    o_key, n_key = F.col(f"__o_{keys[0]}"), F.col(f"__n_{keys[0]}")
    op = (
        F.when(o_key.isNull(), F.lit("I"))
        .when(n_key.isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
    )
    changed = F.lit(False)
    for c in compare:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))

    out_cols = [
        F.coalesce(F.col(f"__n_{k}"), F.col(f"__o_{k}")).alias(k) for k in keys
    ]
    out_cols.append(op.alias("op"))
    for c in compare:
        out_cols.append(F.col(f"__o_{c}").alias(f"old_{c}"))
        out_cols.append(F.col(f"__n_{c}").alias(f"new_{c}"))

    return joined.filter(o_key.isNull() | n_key.isNull() | changed).select(*out_cols)


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE: source rows win, unmatched target rows survive.

    ``source.unionByName(target ANTI-JOIN source)`` — the standard
    copy-on-write MERGE plan. The anti join is the only shuffle; with both
    tables bucketed by the key it disappears, and when ``source`` is small
    (a CDC batch) Catalyst broadcasts it, making the merge a map-only pass
    over the target — exactly what you want when target is 100 TB and the
    batch is megabytes.
    """
    cols = target.columns
    if set(cols) != set(source.columns):
        raise ValueError(
            f"merge requires identical column sets; target-only="
            f"{sorted(set(cols) - set(source.columns))} source-only="
            f"{sorted(set(source.columns) - set(cols))}"
        )
    t_types = {f.name: f.dataType for f in target.schema.fields}
    s_types = {f.name: f.dataType for f in source.schema.fields}
    mismatched = {n for n in t_types if t_types[n] != s_types[n]}
    if mismatched:
        raise ValueError(
            "merge requires identical column types; mismatched: "
            + ", ".join(
                f"{n} (target={t_types[n].simpleString()}, "
                f"source={s_types[n].simpleString()})"
                for n in sorted(mismatched)
            )
        )
    untouched = target.join(source.select(*keys), keys, "left_anti")
    return source.select(*cols).unionByName(untouched.select(*cols))


def apply_scd2(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    initial_ts: str = "1970-01-01 00:00:00",
) -> DataFrame:
    """Fold a change feed into SCD type-2 history.

    ``dim`` rows become the initial version (effective_from = initial_ts);
    each change opens a new version at its ``ts_col`` and closes the
    previous one (effective_to = next version's start, NULL = current).

    One window over (key, ts) — a single shuffle on the key. At scale the
    window partitions are per-entity version chains (tiny), so there is no
    skew concern regardless of table size.
    """
    attr_cols = [c for c in dim.columns if c not in keys]
    base = dim.select(
        *keys, *attr_cols, F.lit(initial_ts).cast("timestamp").alias(ts_col)
    )
    feed = changes.select(*keys, *attr_cols, F.col(ts_col).cast("timestamp"))
    hist = base.unionByName(feed)

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    return hist.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w).alias("effective_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
