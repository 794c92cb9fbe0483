"""Temporal operators Spark lacks natively: as-of join, sessionization.

Both are compositions of built-in DataFrame ops (union + window functions),
never per-row Python — so they shuffle once on the join/session key and scale
with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on, matching on the ``by`` key (ASOF JOIN ... MATCH).

    Implementation: tag + union both sides, one window partitioned by ``by``
    ordered by (on, tag) carrying last_value(right payload) forward, then
    keep left rows. One shuffle on ``by`` — the same cost as a plain
    equi-join on the key, regardless of how many right rows precede each
    left row (vs. the naive join+filter+max which explodes pairs).

    Ordering note: at equal timestamps the right row sorts BEFORE the left
    row (tag 0 < 1), so an exactly-simultaneous right row matches —
    standard ASOF (<=) semantics.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]

    l_tagged = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l_payload"),
    )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.lit(None)
        .cast(l_tagged.schema["__l_payload"].dataType)
        .alias("__l_payload"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__last_{c}")
            for c in rcols
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        F.col("__l_payload.*"),
        *[F.col(f"__last_{c}").alias(f"{c}{suffix}") for c in rcols],
    )
    return out


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_gap_us: int = 60_000_000,
) -> DataFrame:
    """Pairs (a from left, b from right) with the same ``by`` key where
    b strictly follows a (by id) and 0 <= ts_b - ts_a <= max_gap_us.

    Implementation: bucketize time into max_gap windows and equi-join on
    (key, bucket) for the left row's bucket and bucket+1 — any pair within
    the gap falls in the same or adjacent bucket. Catalyst plans this as a
    hash join on a compound key instead of the naive inequality join's
    per-key nested loop; at scale the shuffle is keyed and bounded, and the
    precise interval predicate runs post-join on a tiny candidate set.
    """
    b_us = F.unix_micros(F.col(ts_col))
    l = left.select(
        F.col(by).alias("__by"),
        F.col(id_col).alias("id_a"),
        b_us.alias("us_a"),
        F.floor(b_us / max_gap_us).alias("__bucket"),
    )
    r = right.select(
        F.col(by).alias("__by"),
        F.col(id_col).alias("id_b"),
        b_us.alias("us_b"),
        F.floor(b_us / max_gap_us).alias("__rbucket"),
    )
    # probe the left bucket and its successor
    l2 = l.select(
        "__by", "id_a", "us_a", F.explode(F.array("__bucket", F.col("__bucket") + 1)).alias("__rbucket")
    )
    return (
        l2.join(r, on=["__by", "__rbucket"])
        .filter(
            (F.col("id_b") > F.col("id_a"))
            & (F.col("us_b") >= F.col("us_a"))
            & (F.col("us_b") - F.col("us_a") <= max_gap_us)
        )
        .select("id_a", "id_b")
        .distinct()
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_minutes``.

    lag + cumulative-sum over one window — the batch twin of Structured
    Streaming's ``session_window``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # microsecond epochs: exact integers, no fractional-second ambiguity at
    # the gap boundary (cast-to-long would truncate and disagree with SQL)
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.withColumn("__new", new_session)
        .withColumn(
            "session_seq",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "session_id",
            F.concat_ws("#", F.col(key_col).cast("string"), F.col("session_seq")),
        )
        .drop("__new")
    )


def session_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: bounds, duration, event count."""
    s = sessionize(events, ts_col, key_col, gap_minutes)
    return s.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(F.unix_micros(F.col(ts_col))) - F.min(F.unix_micros(F.col(ts_col)))).alias(
            "duration_us"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


def merge_intervals(
    df: DataFrame,
    by: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key (gaps-and-islands).

    A new island starts where an interval's start exceeds the running
    maximum end of every earlier interval in its partition; the island id
    is the running count of such starts. Two windows over the same
    (key, start, end) ordering — Catalyst evaluates them in one Window
    node, so the whole merge is a single shuffle on ``by`` followed by a
    partial-aggregated groupBy. Interval count per key is unbounded-safe:
    no island state lives on the driver.

    Output: one row per island with ``island_id``, island bounds, and the
    number of source intervals merged into it.
    """
    order = (F.col(start_col).asc(), F.col(end_col).asc())
    w_prev = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(by).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    new_island = (
        F.col(start_col) > F.max(end_col).over(w_prev)
    ).cast("int")
    islands = df.withColumn(
        "__new", F.coalesce(new_island, F.lit(1))
    ).withColumn("island_id", F.sum("__new").over(w_run))
    return islands.groupBy(by, "island_id").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
