"""Incremental-warehouse queries: CDC diff, MERGE upsert, SCD2 history,
mergeable distinct sketches, interval coalescing, Z-order layout stats.

The reference's load path is truncate-and-reload (reference:
data-pipeline/src/load_data_to_db.py) — correct at 1 k rows, impossible
at 100 TB.
These queries exercise the incremental replacements in
``operators/cdc.py`` / ``operators/sketches.py`` / ``operators/layout.py``
/ ``operators/temporal.py::merge_intervals``, each with an exact DuckDB
oracle. Snapshots and change feeds are derived deterministically from the
shared testdata tables (key-modulo selections) so both engines construct
byte-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_spark.operators import cdc as CDC
from etl_data_spark.operators import layout as L
from etl_data_spark.operators import sketches as SK
from etl_data_spark.operators.temporal import merge_intervals
from etl_data_spark.queries import load_table, register

# --------------------------------------------------------------------------
# Deterministic snapshot pair derived from orders:
#   old  = orders with key % 7 != 0
#   new  = orders with key % 5 != 0, price +1.00 where key % 3 == 0
# so the diff contains all three op kinds with exactly computable rows.
# --------------------------------------------------------------------------

_SQL_OLD = "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0"
_SQL_NEW = """
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 5 <> 0
"""


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 7 != 0)
    new = o.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    return old, new


@register(
    "cdc_snapshot_diff",
    f"""
    WITH old AS ({_SQL_OLD}), new AS ({_SQL_NEW})
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'I'
                WHEN n.o_orderkey IS NULL THEN 'D'
                ELSE 'U' END AS op,
           o.o_orderstatus AS old_o_orderstatus,
           n.o_orderstatus AS new_o_orderstatus,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
    doc="Change-data feed between two snapshots (operators/cdc.py::snapshot_diff).",
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _snapshots(spark, sf_dir)
    return CDC.snapshot_diff(old, new, ["o_orderkey"])


@register(
    "cdc_merge_upsert",
    f"""
    WITH old AS ({_SQL_OLD}),
         src AS (SELECT * FROM ({_SQL_NEW}) WHERE o_orderkey % 3 = 0),
         merged AS (
           SELECT * FROM src
           UNION ALL
           SELECT * FROM old o
           WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
         )
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM merged GROUP BY o_orderstatus
    """,
    doc="MERGE (source wins) then rollup (operators/cdc.py::merge_upsert).",
)
def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _snapshots(spark, sf_dir)
    src = new.filter(F.col("o_orderkey") % 3 == 0)
    merged = CDC.merge_upsert(old, src, ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "scd2_apply",
    """
    WITH base AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '1970-01-01 00:00:00' AS ts
      FROM customer
    ), b1 AS (
      SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal,
             TIMESTAMP '2024-01-10 00:00:00' AS ts
      FROM customer WHERE c_custkey % 4 = 0
    ), b2 AS (
      SELECT c_custkey, c_mktsegment, c_acctbal + 200.0 AS c_acctbal,
             TIMESTAMP '2024-01-20 00:00:00' AS ts
      FROM customer WHERE c_custkey % 6 = 0
    ), hist AS (
      SELECT * FROM base UNION ALL SELECT * FROM b1 UNION ALL SELECT * FROM b2
    )
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ts AS effective_from,
           LEAD(ts) OVER (PARTITION BY c_custkey ORDER BY ts) AS effective_to,
           LEAD(ts) OVER (PARTITION BY c_custkey ORDER BY ts) IS NULL AS is_current
    FROM hist
    """,
    doc="SCD2 history fold of two change batches (operators/cdc.py::apply_scd2).",
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    def batch(mod: int, bump: float, ts: str) -> DataFrame:
        return (
            c.filter(F.col("c_custkey") % mod == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(bump))
            .withColumn("ts", F.lit(ts).cast("timestamp"))
        )

    changes = batch(4, 100.0, "2024-01-10 00:00:00").unionByName(
        batch(6, 200.0, "2024-01-20 00:00:00")
    )
    return CDC.apply_scd2(c, changes, ["c_custkey"], "ts")


# --------------------------------------------------------------------------
# Mergeable distinct sketches over events (day increments -> week rollups)
# --------------------------------------------------------------------------

# NB: DuckDB int `/` is float division and CAST rounds-to-nearest, while
# Spark's cast truncates — use explicit floor division on both engines.
_SQL_WEEK = "CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS INT)"


@register(
    "bitmap_distinct_merge",
    f"""
    SELECT {_SQL_WEEK} AS week,
           COUNT(DISTINCT user_id) AS exact_distinct
    FROM events GROUP BY 1
    """,
    doc="Exact mergeable distinct: daily bitmaps OR-merged to weeks "
    "(operators/sketches.py::bitmap_daily/bitmap_rollup).",
)
def q_bitmap_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = SK.bitmap_daily(e, "ts", "user_id")
    weekly = daily.withColumn(
        "week", F.floor(F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) / 7).cast("int")
    )
    return SK.bitmap_rollup(weekly.drop("day"), F.col("week"))


@register(
    "hll_incremental_distinct",
    f"""
    SELECT {_SQL_WEEK} AS week,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_ok
    FROM events GROUP BY 1
    """,
    doc="Daily HLL sketches merged to weeks; the oracle pins the exact count "
    "and expects the estimate within 6% (hll_ok) — a genuine accuracy gate, "
    "since a degenerate sketch flips the flag and fails the hash.",
)
def q_hll_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7
    ).cast("int")
    daily = SK.hll_daily_sketches(e, "ts", "user_id")
    weekly = daily.withColumn(
        "week", F.floor(F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) / 7).cast("int")
    )
    est = SK.hll_rollup(weekly.drop("day"), F.col("week"))
    exact = e.groupBy(week.alias("week")).agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return exact.join(est, "week").select(
        "week",
        "exact_users",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_users"))
            <= 0.06 * F.col("exact_users")
        ).alias("hll_ok"),
    )


# --------------------------------------------------------------------------
# Interval coalescing (gaps-and-islands) over event activity windows
# --------------------------------------------------------------------------


@register(
    "interval_merge",
    """
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e FROM events
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s <= MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS newi
      FROM iv
    ), isl AS (
      SELECT user_id, s, e,
             SUM(newi) OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS UNBOUNDED PRECEDING) AS island_id
      FROM flagged
    ), merged AS (
      SELECT user_id, island_id, MIN(s) AS island_start, MAX(e) AS island_end,
             COUNT(*) AS n_intervals
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(SUM(epoch_us(island_end) - epoch_us(island_start)) AS BIGINT)
             AS covered_us,
           MAX(n_intervals) AS max_merged
    FROM merged GROUP BY user_id
    """,
    doc="Coalesce overlapping 5-minute activity intervals per user "
    "(operators/temporal.py::merge_intervals).",
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    islands = merge_intervals(iv, "user_id", "s", "e")
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(
            F.unix_micros("island_end") - F.unix_micros("island_start")
        ).alias("covered_us"),
        F.max("n_intervals").alias("max_merged"),
    )


# --------------------------------------------------------------------------
# Z-order layout statistics over orders (custkey x orderdate-day)
# --------------------------------------------------------------------------


@register(
    "zorder_layout_stats",
    """
    WITH z AS (
      SELECT o_custkey,
             (CAST(o_orderdate AS DATE) - DATE '1995-01-01') AS day,
             list_sum(list_transform(range(0, 16), i ->
               ((( (o_custkey % 65536) >> i) & 1) << (2 * i))
               + ((( ((CAST(o_orderdate AS DATE) - DATE '1995-01-01') % 65536) >> i) & 1)
                  << (2 * i + 1))
             )) AS zval
      FROM orders
    )
    SELECT CAST(zval AS BIGINT) >> 24 AS zbucket,
           COUNT(*) AS n_rows,
           MIN(o_custkey) AS min_x, MAX(o_custkey) AS max_x,
           MIN(day) AS min_y, MAX(day) AS max_y
    FROM z GROUP BY 1
    """,
    doc="Morton-code bucket min/max spans — the file-skipping statistics a "
    "Z-ordered write yields (operators/layout.py).",
)
def q_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "day"
        ),
    )
    return L.zorder_bucket_stats(o, "o_custkey", "day", bits=16, bucket_shift=24)


# --------------------------------------------------------------------------
# Hypertable-style multi-resolution rollup (operators/rollup.py)
# --------------------------------------------------------------------------

_SQL_GRAIN = """
    SELECT '{g}' AS grain,
           time_bucket(INTERVAL '{iv}', ts) AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY 2
"""


@register(
    "hypertable_rollup",
    " UNION ALL ".join(
        _SQL_GRAIN.format(g=g, iv=iv)
        for g, iv in [("5min", "5 minutes"), ("1h", "1 hour"), ("1d", "1 day")]
    ),
    doc="Continuous-aggregate grain chain: 5-minute partials scanned ONCE "
    "from raw events, hourly folded from the persisted partials, daily "
    "folded from hourly (operators/rollup.py::grain_chain) — the oracle "
    "recomputes every grain directly from raw rows, proving the partial "
    "re-aggregation is exact (decimal sums make fold order irrelevant). "
    "At 100 TB this pattern turns N resolution queries into one fact scan "
    "plus kilobyte-scale folds, and incremental refresh only touches the "
    "fine buckets new data lands in.",
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_spark.operators.rollup import grain_chain

    return grain_chain(load_table(spark, sf_dir, "events"))


@register(
    "sliding_distinct_users",
    """
    WITH h AS (
      SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS hr, user_id
      FROM events
    ),
    s AS (
      SELECT unnest(generate_series(hr - INTERVAL '5 hours', hr,
                                    INTERVAL '1 hour')) AS window_start,
             user_id
      FROM h
    )
    SELECT window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
    FROM s GROUP BY 1
    """,
    doc="Exact distinct users per 6-hour SLIDING window (1-hour step) "
    "from tumbling hourly bitmap partials "
    "(operators/sketches.py::bitmap_sliding_distinct): each hourly "
    "bitmap is exploded to the 6 windows containing it and OR-merged — "
    "the overlap factor touches only kilobyte bitmaps, never raw "
    "events, vs the naive plan's 6x re-scan of the fact table. The "
    "oracle recomputes each window's COUNT(DISTINCT) directly; equality "
    "proves bitmap merge is exact under arbitrary row splits.",
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return SK.bitmap_sliding_distinct(
        SK.bitmap_hourly(e, "ts", "user_id"), window_hours=6
    )


# --------------------------------------------------------------------------
# Point-in-time (as-of) join against SCD2 history
# --------------------------------------------------------------------------


@register(
    "pit_scd2_join",
    """
    WITH base AS (
      SELECT c_custkey, c_acctbal,
             TIMESTAMP '1970-01-01 00:00:00' AS ts
      FROM customer
    ), b1 AS (
      SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
             TIMESTAMP '1997-01-01 00:00:00' AS ts
      FROM customer WHERE c_custkey % 4 = 0
    ), b2 AS (
      SELECT c_custkey, c_acctbal + 200.0 AS c_acctbal,
             TIMESTAMP '1999-01-01 00:00:00' AS ts
      FROM customer WHERE c_custkey % 6 = 0
    ), hist AS (
      SELECT * FROM base UNION ALL SELECT * FROM b1 UNION ALL SELECT * FROM b2
    ), scd AS (
      SELECT c_custkey, c_acctbal, ts AS effective_from,
             LEAD(ts) OVER (PARTITION BY c_custkey ORDER BY ts)
               AS effective_to
      FROM hist
    )
    SELECT o.o_orderkey, o.o_custkey,
           s.c_acctbal AS acctbal_at_order,
           s.effective_from
    FROM orders o JOIN scd s
      ON s.c_custkey = o.o_custkey
     AND s.effective_from <= o.o_orderdate
     AND (s.effective_to IS NULL OR o.o_orderdate < s.effective_to)
    """,
    doc="Point-in-time join: each order picks the SCD2 customer version "
    "valid AT ITS ORDER DATE (effective_from <= t < effective_to) — the "
    "temporal-correctness join every feature store and restated report "
    "needs, where joining the current version would leak the future. "
    "Executed as an equi-join on the entity key with the validity "
    "window as a post-join filter: per-key version chains are tiny by "
    "construction, so the join never degenerates to a range explosion "
    "and shuffles only on the key — the 100 TB-safe PIT shape.",
)
def q_pit_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")

    def batch(mod: int, bump: float, ts: str) -> DataFrame:
        return (
            c.filter(F.col("c_custkey") % mod == 0)
            .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(bump))
            .withColumn("ts", F.lit(ts).cast("timestamp"))
        )

    changes = batch(4, 100.0, "1997-01-01 00:00:00").unionByName(
        batch(6, 200.0, "1999-01-01 00:00:00")
    )
    scd = CDC.apply_scd2(c, changes, ["c_custkey"], "ts").select(
        "c_custkey", "c_acctbal", "effective_from", "effective_to"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    j = o.join(scd, scd["c_custkey"] == o["o_custkey"]).filter(
        (F.col("effective_from") <= F.col("o_orderdate"))
        & (
            F.col("effective_to").isNull()
            | (F.col("o_orderdate") < F.col("effective_to"))
        )
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        F.col("c_acctbal").alias("acctbal_at_order"),
        "effective_from",
    )


# --------------------------------------------------------------------------
# Kimball warehouse patterns: accumulating snapshot, late-arriving dim,
# junk dimension
# --------------------------------------------------------------------------


@register(
    "accumulating_snapshot",
    """
    SELECT o.o_orderkey,
           o.o_orderdate AS placed,
           MIN(l.l_shipdate) AS first_ship,
           MAX(l.l_shipdate) AS last_ship,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                         CAST(MIN(l.l_shipdate) AS DATE)) AS BIGINT)
             AS days_to_first_ship,
           MIN(l.l_linestatus) = 'F' AND MAX(l.l_linestatus) = 'F'
             AS fully_shipped
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    doc="Accumulating-snapshot fact: one row per order carrying its "
    "lifecycle milestones (placed, first/last ship) and derived lags — "
    "the Kimball pattern for pipeline-progress facts, maintained here "
    "as a single keyed join + partial-agg groupBy (milestone updates at "
    "scale are MERGEs touching only in-flight orders; completed rows "
    "never change, which is what makes the table incrementally cheap).",
)
def q_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_linestatus"
    )
    j = o.join(li, li["l_orderkey"] == o["o_orderkey"])
    return j.groupBy("o_orderkey", "o_orderdate").agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
        F.datediff(
            F.min("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("days_to_first_ship"),
        ((F.min("l_linestatus") == "F") & (F.max("l_linestatus") == "F")).alias(
            "fully_shipped"
        ),
    ).select(
        "o_orderkey",
        F.col("o_orderdate").alias("placed"),
        "first_ship",
        "last_ship",
        "n_lines",
        "days_to_first_ship",
        "fully_shipped",
    )


@register(
    "late_arriving_dim",
    """
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 13 <> 0
    ),
    orphans AS (
      SELECT o.o_custkey, o.o_orderdate
      FROM orders o LEFT JOIN dim ON dim.c_custkey = o.o_custkey
      WHERE dim.c_custkey IS NULL
    )
    SELECT o_custkey AS inferred_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_orderdate) AS first_seen,
           'INFERRED' AS member_status
    FROM orphans GROUP BY o_custkey
    """,
    doc="Late-arriving dimension handling: facts referencing keys the "
    "dimension has not delivered yet (simulated by withholding every "
    "13th customer) produce INFERRED placeholder members instead of "
    "dropped or failed rows — the warehouse pattern that keeps fact "
    "loads running when dim feeds lag. One anti-join (left join + null "
    "filter) and a partial-agg groupBy; when the real member arrives, "
    "the SCD2 MERGE path (cdc.py) replaces the placeholder version.",
)
def q_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    dim = c.filter(F.col("c_custkey") % 13 != 0)
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    orphans = o.join(dim, dim["c_custkey"] == o["o_custkey"], "left_anti")
    return orphans.groupBy(
        F.col("o_custkey").alias("inferred_custkey")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderdate").alias("first_seen"),
        F.lit("INFERRED").alias("member_status"),
    )


@register(
    "junk_dimension",
    """
    WITH combos AS (
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    ),
    keyed AS (
      SELECT o_orderstatus, o_orderpriority,
             CAST(ROW_NUMBER() OVER (ORDER BY o_orderstatus, o_orderpriority)
                  AS BIGINT) AS junk_key
      FROM combos
    )
    SELECT k.junk_key, k.o_orderstatus, k.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_facts
    FROM orders o
    JOIN keyed k ON k.o_orderstatus = o.o_orderstatus
                AND k.o_orderpriority = o.o_orderpriority
    GROUP BY 1, 2, 3
    """,
    doc="Junk dimension: the cross product of low-cardinality flags "
    "actually observed in the fact (status x priority) collapsed into "
    "one surrogate-keyed dimension, plus fact counts per combo. The "
    "combo domain is bounded (~15 rows), so the surrogate ROW_NUMBER "
    "window runs on a kilobyte frame and the key-assignment join "
    "broadcasts — the fact table is scanned, never shuffled by the "
    "combo key twice.",
)
def q_junk_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    )
    combos = o.distinct()
    keyed = combos.withColumn(
        "junk_key",
        F.row_number()
        .over(Window.orderBy("o_orderstatus", "o_orderpriority"))
        .cast("long"),
    )
    return (
        o.join(F.broadcast(keyed), ["o_orderstatus", "o_orderpriority"])
        .groupBy("junk_key", "o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_facts"))
    )


@register(
    "drill_across",
    """
    WITH a AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS month, n.n_name AS nation,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS order_value
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    b AS (
      SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS month, n.n_name AS nation,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS shipped_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY 1, 2
    )
    SELECT COALESCE(a.month, b.month) AS month,
           COALESCE(a.nation, b.nation) AS nation,
           COALESCE(a.n_orders, 0) AS n_orders,
           COALESCE(a.order_value, 0.0) + 0.0 AS order_value,
           COALESCE(b.n_lines, 0) AS n_lines,
           COALESCE(b.shipped_value, 0.0) + 0.0 AS shipped_value
    FROM a FULL JOIN b ON b.month = a.month AND b.nation = a.nation
    """,
    doc="Drill-across report: two separately-grained fact processes "
    "(orders by customer nation; shipments by supplier nation) each "
    "aggregated to the CONFORMED (month, nation) grain, then merged "
    "with a full outer join — the Kimball integration pattern that "
    "never joins fact-to-fact at row grain (which would explode). Each "
    "branch is its own partial-agg star join with broadcast dims; the "
    "final join touches only the two small aggregate frames. Decimal "
    "sums keep both engines bit-identical.",
)
def q_drill_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")

    a = (
        o.join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("order_value"),
        )
    )
    b = (
        li.join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .groupBy(
            F.date_trunc("month", "l_shipdate").alias("month"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("shipped_value"),
        )
    )
    j = a.join(b, ["month", "nation"], "full")
    return j.select(
        "month",
        "nation",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        (F.coalesce("order_value", F.lit(0.0)) + F.lit(0.0)).alias(
            "order_value"
        ),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        (F.coalesce("shipped_value", F.lit(0.0)) + F.lit(0.0)).alias(
            "shipped_value"
        ),
    )


@register(
    "cdc_net_changes",
    f"""
    WITH old AS ({_SQL_OLD}), new AS ({_SQL_NEW}),
    feed AS (
      SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'I'
                  WHEN n.o_orderkey IS NULL THEN 'D'
                  ELSE 'U' END AS op,
             COALESCE(CAST(n.o_totalprice AS DECIMAL(18,2)), 0)
               - COALESCE(CAST(o.o_totalprice AS DECIMAL(18,2)), 0)
               AS price_delta,
             COALESCE(n.o_orderstatus, o.o_orderstatus) AS status
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
      WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
         OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
         OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    )
    SELECT status, op,
           CAST(COUNT(*) AS BIGINT) AS n_changes,
           CAST(SUM(price_delta) AS DOUBLE) + 0.0 AS net_revenue_delta
    FROM feed GROUP BY status, op ORDER BY status, op
    """,
    doc="Net-change rollup of the CDC feed: per (status, operation), "
    "change counts and the NET revenue delta (insert adds new value, "
    "delete subtracts old, update contributes the difference) — what "
    "an incremental aggregate-maintenance job applies downstream "
    "instead of recomputing the rollup from scratch. Exact decimal "
    "deltas; composes snapshot_diff's full-outer-join shape with one "
    "partial agg.",
)
def q_cdc_net_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _snapshots(spark, sf_dir)
    feed = CDC.snapshot_diff(old, new, ["o_orderkey"])
    delta = F.coalesce(
        F.col("new_o_totalprice").cast("decimal(18,2)"), F.lit(0)
    ) - F.coalesce(
        F.col("old_o_totalprice").cast("decimal(18,2)"), F.lit(0)
    )
    status = F.coalesce(
        F.col("new_o_orderstatus"), F.col("old_o_orderstatus")
    )
    return (
        feed.select(
            status.alias("status"), "op", delta.alias("price_delta")
        )
        .groupBy("status", "op")
        .agg(
            F.count(F.lit(1)).alias("n_changes"),
            (F.sum("price_delta").cast("double") + F.lit(0.0)).alias(
                "net_revenue_delta"
            ),
        )
        .orderBy("status", "op")
    )
