"""Distributed, fully-seeded synthetic source generator.

Reimplements the reference's pandas generator (reference: data-pipeline/src/
get_dataset.py:6-73) as a *distributed* Spark job: ``spark.range(n)`` plus
hash-derived uniforms, so generating 10^11 rows is an executor-parallel scan
with no driver materialization.

Determinism design: the reference mixes seeded numpy with UNSEEDED stdlib
``random`` (get_dataset.py:21,25-26,44-57), so its output is only partially
reproducible. We instead derive every random draw from
``xxhash64(id, salt)`` — a pure column expression. This is:

- fully deterministic for a given (seed, n), independent of partitioning,
  cluster size, and execution order (unlike ``F.rand`` whose stream is
  per-partition), and
- JVM-side / codegen-friendly: no Python in the row path.

Distributions match the reference's spec:
- salary      ~ Normal(50_000, 20_000)  (Box-Muller on two hash-uniforms)
- purchase    ~ Gamma(k=2, theta=50)    (sum of 2 exponentials: -50*ln(u1*u2))
- age         ~ Uniform{18..70}
- txn_count   ~ Uniform{1..100}
- dates       ~ SCD2 pairs: from = 2023-01-01 + U{0..300}d, to = from + U{30..365}d
Anomaly injection (get_dataset.py:43-57): 5% negative salary, 3% NULL age,
4% inverted dates, 2% x1000 purchase, 3% invalid category.
Duplicate injection (get_dataset.py:63-65): +2% sampled exact duplicates.
Clips (get_dataset.py:67-71): salary/purchase to [-1e6, 1e6], txn to [0, 1e4].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_spark.schemas import (
    CUSTOMER_STATUSES,
    PRODUCT_CATEGORIES,
    REGIONS,
)

TWO63 = float(2**63)


def _u(seed: int, salt: str) -> Column:
    """Uniform(0,1) derived from the row id — deterministic, partition-independent.

    xxhash64 returns a signed 64-bit value; normalize to (0,1) and keep it
    strictly inside the open interval so ln(u) is finite.
    """
    h = F.xxhash64(F.col("id"), F.lit(salt), F.lit(seed))
    u = (h.cast("double") / F.lit(TWO63) + F.lit(1.0)) / F.lit(2.0)
    return F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))


def _uniform_int(seed: int, salt: str, lo: int, hi: int) -> Column:
    return (_u(seed, salt) * F.lit(hi - lo + 1)).cast("int") + F.lit(lo)


def _choice(seed: int, salt: str, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    idx = (_u(seed, salt) * F.lit(len(values))).cast("int") + F.lit(1)
    return F.element_at(arr, idx)


def generate_source(
    spark: SparkSession,
    rows: int = 1000,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate the dirty bronze-source table, anomalies and duplicates included."""
    base = spark.range(1, rows + 1, numPartitions=num_partitions)

    user_num = _uniform_int(seed, "user", 1, 100)
    user_id = F.format_string("user_%04d", user_num)

    # Normal(50000, 20000) via Box-Muller: z = sqrt(-2 ln u1) * cos(2 pi u2)
    z = F.sqrt(F.lit(-2.0) * F.log(_u(seed, "norm1"))) * F.cos(
        F.lit(2.0 * 3.141592653589793) * _u(seed, "norm2")
    )
    salary = F.lit(50000.0) + F.lit(20000.0) * z

    # Gamma(k=2, theta=50) as sum of two Exponential(theta=50)
    purchase = F.lit(-50.0) * F.log(_u(seed, "gam1") * _u(seed, "gam2"))

    eff_from = F.date_add(F.lit("2023-01-01").cast("date"), _uniform_int(seed, "dfrom", 0, 300))
    eff_to = F.date_add(eff_from, _uniform_int(seed, "dto", 30, 365))

    df = base.select(
        F.col("id"),
        user_id.alias("user_id"),
        F.format_string("User %04d", user_num).alias("user_name"),
        _uniform_int(seed, "age", 18, 70).alias("age"),
        salary.alias("salary"),
        purchase.alias("purchase_amount"),
        _choice(seed, "cat", PRODUCT_CATEGORIES).alias("product_category"),
        _choice(seed, "reg", REGIONS).alias("region"),
        _choice(seed, "status", CUSTOMER_STATUSES).alias("customer_status"),
        _uniform_int(seed, "txn", 1, 100).alias("transaction_count"),
        eff_from.alias("effective_from"),
        eff_to.alias("effective_to"),
        (_u(seed, "flag") > F.lit(0.3)).alias("current_flag"),
    )

    # Anomaly injection — independent draws per anomaly, like the reference
    df = df.select(
        "id",
        "user_id",
        "user_name",
        F.when(_u(seed, "a_nullage") < 0.03, F.lit(None).cast("int"))
        .otherwise(F.col("age"))
        .alias("age"),
        F.when(_u(seed, "a_negsal") < 0.05, -F.abs(F.col("salary")))
        .otherwise(F.col("salary"))
        .alias("salary"),
        F.when(_u(seed, "a_bigbuy") < 0.02, F.col("purchase_amount") * 1000)
        .otherwise(F.col("purchase_amount"))
        .alias("purchase_amount"),
        F.when(_u(seed, "a_badcat") < 0.03, F.lit("Invalid_Category"))
        .otherwise(F.col("product_category"))
        .alias("product_category"),
        "region",
        "customer_status",
        "transaction_count",
        "effective_from",
        F.when(
            _u(seed, "a_baddate") < 0.04, F.date_add(F.col("effective_from"), -10)
        )
        .otherwise(F.col("effective_to"))
        .alias("effective_to"),
        "current_flag",
    )

    # +2% exact duplicates (bag-union, get_dataset.py:63-65). Duplicate ids
    # intentionally repeat: bronze has no uniqueness guarantee.
    dups = df.filter(_u(seed, "dup") < 0.02)
    df = df.unionAll(dups)

    # Post-gen clips (get_dataset.py:67-71)
    clip = lambda c, lo, hi: F.least(F.greatest(c, F.lit(lo)), F.lit(hi))  # noqa: E731
    df = df.withColumn("salary", clip(F.col("salary"), -1000000.0, 1000000.0))
    df = df.withColumn(
        "purchase_amount", clip(F.col("purchase_amount"), -1000000.0, 1000000.0)
    )
    df = df.withColumn("transaction_count", clip(F.col("transaction_count"), 0, 10000))

    # Decimal money columns + load audit timestamp (01_init_all.sql:19)
    return (
        df.withColumn("salary", F.col("salary").cast("decimal(15,2)"))
        .withColumn("purchase_amount", F.col("purchase_amount").cast("decimal(15,2)"))
        .withColumn("loaded_at", F.current_timestamp())
    )
