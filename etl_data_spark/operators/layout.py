"""Data-layout operators: multi-dimensional clustering (Z-order).

The reference gets its point lookups from B-tree indexes
(``sql/init/01_init_all.sql`` CREATE INDEX); a parquet lake gets the same
effect from file-level min/max statistics — but only if rows that are close
in the filter dimensions land in the same files. Sorting by one column
clusters that column only; interleaving the bits of two columns (a Z-order
curve) clusters both at once, so ``WHERE x BETWEEN …`` *and*
``WHERE y BETWEEN …`` each skip most files.

``z_value`` is pure integer arithmetic (shift/mask/sum over a literal
sequence) — whole-stage-codegen'd, no UDF. The write path is
``df.repartitionByRange(n, z).sortWithinPartitions(z).write…``: one range
exchange, then every output file covers a tight Z-range, i.e. a small
rectangle in (x, y) space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def z_value(x, y, bits: int = 16) -> F.Column:
    """Interleave the low ``bits`` of two non-negative ints: Morton code.

    x occupies even bit positions, y odd. Columns are masked to ``bits``
    first, so out-of-range values wrap rather than corrupt high bits.
    """
    # pmod, not %: Spark's % preserves sign, so a negative key would yield
    # negative remainders, and shiftright(neg) % 2 returns -1 — corrupting
    # the Morton code and diverging from the SQL mirror's & 1. pmod + a
    # bitwise & keep every lane in {0,1} for any input sign.
    xc = F.pmod((F.col(x) if isinstance(x, str) else x).cast("long"), F.lit(1 << bits))
    yc = F.pmod((F.col(y) if isinstance(y, str) else y).cast("long"), F.lit(1 << bits))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i) + (
            F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_bucket_stats(
    df: DataFrame, x: str, y: str, bits: int = 16, bucket_shift: int = 24
) -> DataFrame:
    """Per-Z-bucket min/max spans of both dimensions — the file-skipping
    statistics a Z-ordered write would give each parquet file.

    ``bucket = z >> bucket_shift`` stands in for "output file". Narrow
    per-bucket (min,max) spans in *both* x and y are exactly what lets a
    reader prune files on either predicate. Deterministic (no range
    sampling), so it doubles as the SQL-oracle-checkable face of the
    layout operator.
    """
    z = z_value(x, y, bits)
    return (
        df.withColumn("zbucket", F.shiftright(z, bucket_shift))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x).alias("min_x"),
            F.max(x).alias("max_x"),
            F.min(y).alias("min_y"),
            F.max(y).alias("max_y"),
        )
    )


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int, bits: int = 16
) -> None:
    """Write ``df`` Z-clustered on (x, y): range-partition by the Morton
    code so each file covers a tight rectangle of the key space."""
    (
        df.withColumn("__z", z_value(x, y, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
