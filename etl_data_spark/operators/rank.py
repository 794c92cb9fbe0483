"""Distributed global ranking without a single-partition Window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
whole dataset into one window partition — the classic Spark scale-killer
(one task ranks 100 TB). The scale-correct construction, implemented here:

1. ``repartitionByRange`` on the sort key — Spark's RangePartitioner
   samples boundaries (deterministic seed per partition index) and ships
   each row to the partition owning its key range; partition *i* holds
   keys strictly below partition *i+1*'s. The explicit partition count
   (``REPARTITION_BY_NUM``) also opts out of AQE coalescing, so both
   consumers of the exchange see the identical layout.
2. ``sortWithinPartitions`` + ``monotonically_increasing_id`` — the id
   encodes (partition id << 33) | local row offset, so the per-partition
   rank comes from a map-side projection: NO window over the data, no
   second full-data shuffle (the first implementation used a
   ``Window.partitionBy(spark_partition_id())``, which forced an extra
   hashpartitioning exchange of every row; this form removes it).
3. A tiny per-partition row-count aggregate (#partitions rows) becomes a
   broadcast cumulative-offset table; global rank = local offset + 1 +
   offset of all earlier partitions.

The count branch re-reads the same range exchange (identical canonical
subplan -> ReusedExchange at runtime), so the data is ranged once.

Reference parity: the reference engine ranks via its single-node sort
(Nikitpolin/etl-data has no distributed rank); this operator exists for
the 100 TB path where that is not an option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


_PID = "__gr_pid"
_MID = "__gr_mid"

# monotonically_increasing_id layout: partition id in the upper bits,
# per-partition record offset in the lower 33
_OFFSET_BITS = 33
_OFFSET_MASK = (1 << _OFFSET_BITS) - 1


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str | list[str],
    out_col: str | list[str] = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``SUM(val) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``.

    Same decomposition as :func:`global_row_number`: range-partition on the
    sort key, fold within partitions, add broadcast offsets of all earlier
    partitions' totals. The within-partition fold needs a sequential
    window, so this costs one extra hashpartitioning exchange on the
    partition id (each range partition moves as a unit) — still bounded
    parallelism over every partition, vs. the single task a global window
    would use. Use an exact (decimal/integer) ``val_col`` if the running
    sum must be reproducible bit-for-bit: the fold order within and
    across partitions is fixed by the sort, but exact types make the
    result independent of the decomposition by construction.

    ``val_col``/``out_col`` may be parallel lists to cumulate several
    columns over ONE range decomposition (one exchange, one window pass,
    one offsets broadcast — vs. re-partitioning per column).
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    keys = [F.col(c) for c in order_cols]
    # localCheckpoint PINS the range exchange: Spark 4's RangePartitioner
    # draws a fresh sampling seed per job, so re-executing this subplan in
    # the offsets branch can produce DIFFERENT partition boundaries than
    # the data branch saw (observed: per-trial boundary drift, offsets
    # joined onto the wrong _PIDs, running sums exceeding the total).
    # ReusedExchange hides this for some plan shapes but is not guaranteed
    # — the checkpoint makes both branches read one concrete RDD.
    # deliberately localCheckpoint, NOT truncate_lineage: this pin exists
    # only for JOB-LOCAL determinism (both branches must read one concrete
    # RDD within this query); an executor loss simply fails and retries
    # the query, so paying a durable-storage round-trip of the FULL
    # dataset per ranking call would buy nothing
    parts = (
        df.repartitionByRange(num_partitions, *keys)
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(
            _PID, F.shiftrightunsigned(F.col(_MID), _OFFSET_BITS).cast("int")
        )
        .drop(_MID)
        .localCheckpoint(eager=True)
    )
    val_cols = [val_col] if isinstance(val_col, str) else list(val_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(val_cols) != len(out_cols):
        raise ValueError("val_col and out_col must have equal arity")
    if len(set(val_cols)) != len(val_cols) or len(set(out_cols)) != len(out_cols):
        raise ValueError(
            f"val_col/out_col must be unique (got {val_cols} -> {out_cols}): "
            "duplicates would silently collide in the generated scratch columns"
        )
    clash = [vc for vc in val_cols if f"__gr_local_{vc}" in df.columns
             or f"__gr_tot_{vc}" in df.columns or f"__gr_off_{vc}" in df.columns]
    if clash:
        raise ValueError(f"input columns collide with scratch names for {clash}")
    wrun = (
        Window.partitionBy(_PID)
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts
    for vc in val_cols:
        local = local.withColumn(f"__gr_local_{vc}", F.sum(vc).over(wrun))
    totals = parts.groupBy(_PID).agg(
        *[F.sum(vc).alias(f"__gr_tot_{vc}") for vc in val_cols]
    )
    wprev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *[
            F.coalesce(
                F.sum(f"__gr_tot_{vc}").over(wprev), F.lit(0).cast("long")
            ).alias(f"__gr_off_{vc}")
            for vc in val_cols
        ],
    )
    out = local.join(F.broadcast(offsets), _PID)
    for vc, oc in zip(val_cols, out_cols):
        out = out.withColumn(
            oc, F.col(f"__gr_local_{vc}") + F.col(f"__gr_off_{vc}")
        )
    return out.drop(
        _PID,
        *[f"__gr_local_{vc}" for vc in val_cols],
        *[f"__gr_off_{vc}" for vc in val_cols],
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row_number over ``order_cols`` (ascending), computed
    distributedly. ``order_cols`` must form a total order (include a unique
    tiebreak column) or ranks of tied rows are partition-placement
    dependent.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    keys = [F.col(c) for c in order_cols]
    # localCheckpoint pins the range exchange — same rationale as
    # global_running_sum: per-job sampling-seed drift in the range
    # partitioner must not let the counts branch see different partition
    # boundaries than the rank branch.
    # localCheckpoint on purpose — same job-local-determinism rationale as
    # global_running_sum above
    parts = (
        df.repartitionByRange(num_partitions, *keys)
        .sortWithinPartitions(*keys)
        .withColumn(_MID, F.monotonically_increasing_id())
        .withColumn(
            _PID, F.shiftrightunsigned(F.col(_MID), _OFFSET_BITS).cast("int")
        )
        .localCheckpoint(eager=True)
    )
    # #partitions rows -> cumulative offset of every earlier partition.
    # The window here is over the tiny counts frame (bounded by
    # num_partitions, not data size).
    counts = parts.groupBy(_PID).agg(F.count(F.lit(1)).alias("__gr_cnt"))
    offsets = counts.select(
        _PID,
        F.coalesce(
            F.sum("__gr_cnt").over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__gr_off"),
    )
    return (
        parts.join(F.broadcast(offsets), _PID)
        .withColumn(
            out_col,
            (
                F.col(_MID).bitwiseAND(F.lit(_OFFSET_MASK))
                + F.lit(1)
                + F.col("__gr_off")
            ).cast("long"),
        )
        .drop(_PID, _MID, "__gr_off")
    )
