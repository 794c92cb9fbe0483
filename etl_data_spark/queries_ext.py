"""Extended relational coverage: multi-dim aggregation (rollup/cube/pivot),
window aggregates beyond ranking, set ops, JSON extraction, range joins,
exact percentiles, and the scalar-function surface.

These go beyond the reference's own operator set (SURVEY §2 notes it has no
OVER clauses, grouping sets, or JSON) — they complete the engine surface a
user migrating a real warehouse would expect, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_data_spark.queries import _dec, load_table, register

# --------------------------------------------------------------------------
# Multi-dimensional aggregation
# --------------------------------------------------------------------------


@register(
    "rollup_revenue",
    """
    SELECT COALESCE(r.r_name, 'ALL') AS region_name,
           COALESCE(n.n_name, 'ALL') AS nation_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))), 0) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    doc="ROLLUP hierarchy subtotals (region > nation > grand total).",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice", 14)), F.lit(0))
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "cube_counts",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions (all subtotal combinations).",
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


@register(
    "pivot_status_priority",
    """
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS notspec,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Pivot (wide conditional counts) of priority within status.",
)
def q_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.count(F.lit(1)))
    )
    renames = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "notspec",
        "5-LOW": "low",
    }
    out = pivoted
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # pivot yields NULL for empty cells; FILTER-count yields 0
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (two single-dim slices + grand total).",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "sliding_window_agg",
    # each event belongs to 2 overlapping 10-min windows (5-min hop); the
    # mirror generates both memberships via two bucket origins
    """
    SELECT window_start, event_type, COUNT(*) AS n
    FROM (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
               AS window_start, event_type
      FROM events
    )
    GROUP BY window_start, event_type
    """,
    doc="Hopping/sliding window agg (10-min window, 5-min hop) — batch twin "
    "of streaming sliding windows.",
)
def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@register(
    "approx_percentiles",
    # tolerance-flag oracle: the exact quantiles hash-match and the *_ok
    # booleans fail the hash if the sketch drifts out of tolerance — the
    # driver now verifies the accuracy contract, not just row shape
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           TRUE AS median_ok, TRUE AS p90_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="approx_percentile (t-digest style sketch) — the at-scale quantile "
    "path; mergeable across partitions. Emits exact quantiles plus "
    "sketch-within-2%% flags so the driver hash checks accuracy.",
)
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("a_med"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("a_p90"),
    )
    return agg.select(
        "l_returnflag",
        "median_qty",
        "p90_price",
        (F.abs(F.col("a_med") - F.col("median_qty")) <= 0.02 * F.abs(F.col("median_qty"))).alias("median_ok"),
        (F.abs(F.col("a_p90") - F.col("p90_price")) <= 0.02 * F.abs(F.col("p90_price"))).alias("p90_ok"),
    )


@register(
    "exact_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.9) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (median / p90).",
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
    )


@register(
    "distinct_count_exact",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Exact COUNT(DISTINCT) per group (expands to a two-phase agg).",
)
def q_distinct_count_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "approx_distinct",
    # exact counts hash-match; the *_ok flags turn HLL++ accuracy into a
    # driver-verifiable contract (deterministic sketch, 10% tolerance vs
    # the default rsd=0.05)
    """
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           TRUE AS parts_ok, TRUE AS orders_ok
    FROM lineitem
    """,
    doc="approx_count_distinct (HyperLogLog++) — the at-scale distinct path; "
    "emits exact counts plus within-tolerance flags for the driver hash.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey").alias("a_parts"),
        F.approx_count_distinct("l_orderkey").alias("a_orders"),
    )
    return agg.select(
        "exact_parts",
        "exact_orders",
        (F.abs(F.col("a_parts") - F.col("exact_parts")) <= 0.1 * F.col("exact_parts")).alias("parts_ok"),
        (F.abs(F.col("a_orders") - F.col("exact_orders")) <= 0.1 * F.col("exact_orders")).alias("orders_ok"),
    )


# --------------------------------------------------------------------------
# Window aggregates beyond ranking
# --------------------------------------------------------------------------


@register(
    "running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders
    """,
    doc="Cumulative windowed sum per key (running total).",
)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice", 14)).over(w).cast("double").alias("running_total"),
    )


@register(
    "order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           epoch_us(o_orderdate)
             - epoch_us(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey)) AS gap_us
    FROM orders
    """,
    doc="lag() inter-event gaps per key (NULL for each key's first row).",
)
def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # unix_micros requires TIMESTAMP; session is pinned UTC so the NTZ cast
    # is deterministic and equals DuckDB's epoch_us of the naive value
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@register(
    "rank_in_nation",
    """
    SELECT c_custkey, c_nationkey,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense_rank
    FROM customer
    """,
    doc="rank/dense_rank with ties (deterministic: rank is tie-stable).",
)
def q_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


@register(
    "window_function_surface",
    """
    SELECT c_nationkey, c_custkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(c_custkey) OVER w2 AS richest,
           NTH_VALUE(c_custkey, 2) OVER w2 AS second_richest,
           LAST_VALUE(c_custkey) OVER w2 AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
           w2 AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Remaining analytic-window surface: percent_rank / cume_dist / "
    "ntile / first / nth / last over an explicit full-partition frame "
    "(unique tie-break key keeps every function deterministic).",
)
def q_window_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("c_custkey").over(w2).alias("richest"),
        F.nth_value("c_custkey", 2).over(w2).alias("second_richest"),
        F.last("c_custkey").over(w2).alias("poorest"),
    )


@register(
    "scd2_current_rows",
    """
    SELECT o_custkey, o_orderkey,
           CASE WHEN (o_orderdate, o_orderkey) = (
                  MAX((o_orderdate, o_orderkey)) OVER (PARTITION BY o_custkey))
                THEN TRUE ELSE FALSE END AS current_flag
    FROM orders
    """,
    doc="SCD2 current-row flagging: latest version per key marked current.",
)
def q_scd2_current_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.row_number().over(w) == 1).alias("current_flag"),
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@register(
    "intersect_keys",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="INTERSECT (set semantics).",
)
def q_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.intersect(b)


@register(
    "except_keys",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="EXCEPT (set difference).",
)
def q_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.exceptAll(b).distinct()


@register(
    "union_all_bag",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="UNION ALL bag semantics (duplicates preserved — the S3 dup-injector shape).",
)
def q_union_all_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return a.unionAll(b)


@register(
    "full_outer_totals",
    """
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           cn.n_customers, sn.n_suppliers
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
          FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                     FROM supplier GROUP BY s_nationkey) sn
      ON cn.nationkey = sn.nationkey
    """,
    doc="FULL OUTER join of two aggregates (unmatched sides preserved).",
)
def q_full_outer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return cn.join(sn, "nationkey", "full_outer").select(
        "nationkey", "n_customers", "n_suppliers"
    )


@register(
    "cross_join_grid",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="CROSS JOIN of two small dims (explicit Cartesian grid).",
)
def q_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --------------------------------------------------------------------------
# JSON, scalar functions, range join
# --------------------------------------------------------------------------


@register(
    "array_agg_ops",
    """
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
           len(list_sort(list(DISTINCT c_mktsegment))) AS n_segments,
           list_sort(list(DISTINCT c_mktsegment))[1] AS first_segment,
           list_contains(list_sort(list(DISTINCT c_mktsegment)), 'BUILDING')
             AS has_building
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Array aggregation + array ops: collect_set -> sorted array, size, "
    "element_at, array_contains (deterministic via sort). The array column "
    "is serialized with a '|' delimiter at the emit boundary so the driver "
    "canonicalizer (pandas sort + hash) can handle the cell values; the "
    "in-engine representation stays a real array.",
)
def q_array_agg_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    segs = F.sort_array(F.collect_set("c_mktsegment"))
    return c.groupBy("c_nationkey").agg(
        F.concat_ws("|", segs).alias("segments"),
        F.size(segs).alias("n_segments"),
        F.element_at(segs, 1).alias("first_segment"),
        F.array_contains(segs, "BUILDING").alias("has_building"),
    )


@register(
    "explode_posexplode",
    """
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id < 20
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS tok
    FROM s, UNNEST(range(1, len(toks) + 1)) AS u(i)
    """,
    doc="posexplode of a split array (lateral flatten with position).",
)
def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


@register(
    "json_extract_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
           COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NULL) AS n_missing
    FROM events
    GROUP BY event_type
    """,
    doc="JSON field extraction + aggregation over a string props column.",
)
def q_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("total_k"),
        F.count(F.when(k.isNull(), 1)).alias("n_missing"),
    )


@register(
    "scalar_function_surface",
    """
    SELECT p_partkey,
           upper(substr(p_name, 1, 8)) AS name_head,
           length(p_name) AS name_len,
           replace(p_brand, 'Brand', 'B') AS brand_short,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           abs(p_retailprice - 1000.0) AS price_dev,
           CAST(round(CAST(p_retailprice AS DECIMAL(12,2)) * 1.1, 2) AS DOUBLE) AS price_up,
           coalesce(nullif(p_type, ''), 'unknown') AS type_clean
    FROM part
    """,
    doc="Scalar-function surface: substr/upper/length/replace/lpad/abs/round/coalesce/nullif.",
)
def q_scalar_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name_head"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand"), F.lit("B")).alias("brand_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.round(_dec("p_retailprice", 12) * F.lit(1.1), 2)
        .cast("double")
        .alias("price_up"),
        F.coalesce(F.nullif(F.col("p_type"), F.lit("")), F.lit("unknown")).alias(
            "type_clean"
        ),
    )


@register(
    "string_function_surface",
    """
    SELECT p_partkey,
           trim(p_name) AS name_trim,
           translate(p_brand, '#', '_') AS brand_tr,
           strpos(p_name, 'e') AS first_e,
           reverse(p_type) AS type_rev,
           repeat(left(p_name, 2), 2) AS head_twice,
           right(p_name, 3) AS name_tail,
           contains(p_name, 'red') AS has_red,
           starts_with(p_type, 'PROMO') AS is_promo,
           ends_with(p_name, 'bolt') AS is_bolt,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
    doc="String surface II: trim/translate/strpos/reverse/repeat/left/right/"
    "contains/starts_with/ends_with/concat_ws.",
)
def q_string_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.trim("p_name").alias("name_trim"),
        F.translate(F.col("p_brand"), "#", "_").alias("brand_tr"),
        F.instr(F.col("p_name"), "e").cast("long").alias("first_e"),
        F.reverse("p_type").alias("type_rev"),
        F.repeat(F.substring("p_name", 1, 2), 2).alias("head_twice"),
        F.substring(F.col("p_name"), -3, 3).alias("name_tail"),
        F.contains(F.col("p_name"), F.lit("red")).alias("has_red"),
        F.startswith(F.col("p_type"), F.lit("PROMO")).alias("is_promo"),
        F.endswith(F.col("p_name"), F.lit("bolt")).alias("is_bolt"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "date_arithmetic",
    """
    SELECT o_orderkey,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
             AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS minus_week,
           EXTRACT(dow FROM o_orderdate) AS dow
    FROM orders
    """,
    doc="Date arithmetic surface: datediff/add_months/last_day/date_sub/"
    "day-of-week (month-end clamping semantics agree across engines).",
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("long").alias(
            "days_to_y2k"
        ),
        F.add_months(d, 3).alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.date_sub(d, 7).alias("minus_week"),
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dow: 0=Sunday..6
        (F.dayofweek(d) - 1).cast("long").alias("dow"),
    )


@register(
    "null_semantics",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n,
           COUNT(o_custkey) AS n_nonnull_cust,
           COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_null_cust,
           COUNT(*) FILTER (WHERE o_custkey IS NOT DISTINCT FROM 1) AS n_cust1_nullsafe,
           CAST(COALESCE(MAX(o_custkey), -1) AS BIGINT) AS max_cust_or_default
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="NULL semantics: COUNT(col) vs COUNT(*), IS NULL filters, null-safe "
    "equality (<=> / IS NOT DISTINCT FROM), COALESCE defaulting.",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("n_nonnull_cust"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_null_cust"),
        F.count(F.when(F.col("o_custkey").eqNullSafe(F.lit(1)), 1)).alias(
            "n_cust1_nullsafe"
        ),
        F.coalesce(F.max("o_custkey"), F.lit(-1)).cast("long").alias(
            "max_cust_or_default"
        ),
    )


@register(
    "date_parts",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS y,
           EXTRACT(month FROM o_orderdate) AS m,
           EXTRACT(quarter FROM o_orderdate) AS q,
           CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start
    FROM orders
    """,
    doc="Date-part extraction and truncation.",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
    )


@register(
    "range_join_bursts",
    """
    SELECT a.event_id AS id_a, b.event_id AS id_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id > a.event_id
     AND epoch_us(b.ts) >= epoch_us(a.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
    WHERE a.event_type = 'error'
    """,
    doc="Range join: same-user event pairs within 60s of an error (bucketized).",
)
def q_range_join_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_spark.operators.temporal import range_join_within

    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "error")
    return range_join_within(
        left, e, by="user_id", ts_col="ts", id_col="event_id", max_gap_us=60_000_000
    )


@register(
    "salted_join_agg",
    """
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="Salted skew-proof join (8 salts) — row-identical to the plain join, "
    "so the oracle is the unsalted SQL. NOTE: this query exists to exercise "
    "the operator; for lineitem JOIN part specifically, broadcast(part) is "
    "the better plan and salting is reserved for joins where neither "
    "broadcast nor AQE skew-split applies (operators/skew.py docstring).",
)
def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li.withColumnRenamed("l_partkey", "p_partkey"),
        p,
        on=["p_partkey"],
        n_salts=8,
        scatter_cols=["l_orderkey", "l_linenumber"],
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_extendedprice", 12)).cast("double").alias("revenue"),
    )


@register(
    "generator_profile",
    None,  # the hash-derived generator has no SQL mirror; determinism and
    # distribution shape are pinned in tests/test_pipeline.py
    doc="Seeded distributed synthetic source (reference get_dataset.py "
    "semantics: anomaly + duplicate injection) profiled by category.",
)
def q_generator_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_data_spark.generate import generate_source

    dirty = generate_source(spark, rows=1000, seed=42)
    return (
        dirty.groupBy("product_category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("salary") < 0, 1)).alias("n_neg_salary"),
            F.count(F.when(F.col("age").isNull(), 1)).alias("n_null_age"),
            F.count(
                F.when(F.col("effective_to") < F.col("effective_from"), 1)
            ).alias("n_inverted_dates"),
        )
        .orderBy("product_category")
    )


@register(
    "dq_checks_orders",
    """
    WITH li_n AS (SELECT COUNT(*) AS c FROM lineitem),
         lo_n AS (SELECT COUNT(*) AS c
                  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         nulls AS (SELECT COUNT(*) FILTER (WHERE o_custkey IS NULL) AS c,
                          COUNT(*) AS total FROM orders),
         ship AS (SELECT COUNT(*) AS c
                  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                  WHERE l.l_shipdate < o.o_orderdate),
         dups AS (SELECT COUNT(*) AS c FROM (
                    SELECT o_orderkey FROM orders
                    GROUP BY o_orderkey HAVING COUNT(*) > 1)),
         vals AS (SELECT COUNT(*) AS c FROM orders
                  WHERE o_totalprice < 0 OR o_totalprice > 10000000),
         checks AS (
           SELECT 1 AS check_id, 'correctness' AS check_type,
                  'Fact row-count reconciliation' AS check_name,
                  CAST(li_n.c AS DOUBLE) AS expected_value,
                  CAST(lo_n.c AS DOUBLE) AS actual_value,
                  CASE WHEN li_n.c = lo_n.c THEN 'passed' ELSE 'failed' END AS status
           FROM li_n, lo_n
           UNION ALL
           SELECT 2, 'completeness', 'Null customer keys',
                  CAST(NULL AS DOUBLE), CAST(nulls.c AS DOUBLE),
                  CASE WHEN nulls.c * 100.0 <= nulls.total * 5 THEN 'passed'
                       ELSE 'failed' END
           FROM nulls
           UNION ALL
           SELECT 3, 'consistency', 'Ship date not before order date',
                  CAST(NULL AS DOUBLE), CAST(ship.c AS DOUBLE),
                  CASE WHEN ship.c = 0 THEN 'passed' ELSE 'failed' END
           FROM ship
           UNION ALL
           SELECT 4, 'uniqueness', 'Duplicate order keys',
                  CAST(NULL AS DOUBLE), CAST(dups.c AS DOUBLE),
                  CASE WHEN dups.c = 0 THEN 'passed' ELSE 'failed' END
           FROM dups
           UNION ALL
           SELECT 5, 'validity', 'Total price range',
                  CAST(NULL AS DOUBLE), CAST(vals.c AS DOUBLE),
                  CASE WHEN vals.c = 0 THEN 'passed' ELSE 'failed' END
           FROM vals
         )
    SELECT check_id, check_type, check_name, expected_value, actual_value, status
    FROM checks
    UNION ALL
    SELECT 6, 'summary', 'Overall DQ check',
           5.0, CAST((SELECT COUNT(*) FROM checks WHERE status = 'passed') AS DOUBLE),
           CASE WHEN (SELECT COUNT(*) FROM checks WHERE status = 'failed') = 0
                THEN 'passed' ELSE 'failed' END
    """,
    doc="The declarative DQ framework (reference fn_dq_checks_load semantics: "
    "5 checks + summary, per-check error isolation) over the orders/lineitem "
    "tables; integer-valued metrics so the oracle is drift-free.",
)
def q_dq_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    from etl_data_spark.dq import CheckSpec, run_checks

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lo = li.join(o, li.l_orderkey == o.o_orderkey)

    def counts():
        return float(li.count()), float(lo.count())

    def nulls():
        return None, float(o.filter(F.col("o_custkey").isNull()).count())

    n_orders = o.count()

    def ship_before_order():
        return None, float(lo.filter(F.col("l_shipdate") < F.col("o_orderdate")).count())

    def dup_keys():
        return None, float(
            o.groupBy("o_orderkey").count().filter(F.col("count") > 1).count()
        )

    def bad_price():
        return None, float(
            o.filter((F.col("o_totalprice") < 0) | (F.col("o_totalprice") > 1e7)).count()
        )

    checks = [
        CheckSpec("correctness", "Fact row-count reconciliation", counts,
                  lambda e, a: e == a, table_name="lineitem"),
        CheckSpec("completeness", "Null customer keys", nulls,
                  lambda e, a: (a or 0) * 100.0 <= n_orders * 5,
                  table_name="orders", column_name="o_custkey"),
        CheckSpec("consistency", "Ship date not before order date",
                  ship_before_order, lambda e, a: a == 0, table_name="lineitem"),
        CheckSpec("uniqueness", "Duplicate order keys", dup_keys,
                  lambda e, a: a == 0, table_name="orders"),
        CheckSpec("validity", "Total price range", bad_price,
                  lambda e, a: a == 0, table_name="orders",
                  column_name="o_totalprice"),
    ]
    res = run_checks(spark, checks, execution_date=_dt.datetime(2024, 1, 1))
    return res.select(
        "check_id",
        "check_type",
        "check_name",
        F.col("expected_value").cast("double").alias("expected_value"),
        F.col("actual_value").cast("double").alias("actual_value"),
        "status",
    )


# --------------------------------------------------------------------------
# Subquery shapes & TPC-H classics
# --------------------------------------------------------------------------
#
# Comparisons against averages use the exact form  value * n > total  (all
# decimal/integer arithmetic) instead of  value > total / n  — division would
# put a rounded double on one side of the predicate and make the boundary
# rows engine-dependent.


@register(
    "scalar_subquery_above_avg",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders, (SELECT SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS total,
                         COUNT(*) AS n
                  FROM orders) g
    WHERE CAST(o_totalprice AS DECIMAL(14,2)) * n > total
    """,
    doc="Scalar-subquery filter: orders above the global average price.",
)
def q_scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.agg(
        F.sum(_dec("o_totalprice", 14)).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    # one-row aggregate broadcast against the fact — no driver round-trip
    return (
        o.crossJoin(F.broadcast(g))
        .filter(_dec("o_totalprice", 14) * F.col("n") > F.col("total"))
        .select(
            "o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice")
        )
    )


@register(
    "correlated_avg_filter",
    """
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(12,2)) * 5 * pa.cnt < pa.sum_qty
    """,
    doc="TPC-H Q17 shape: correlated avg subquery, decorrelated to agg+join.",
)
def q_correlated_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity", 12)).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(pa, "l_partkey")
        .filter(_dec("l_quantity", 12) * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice", 12)).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q3_shipping",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join + group-agg + deterministic top-10.",
)
def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    price, disc = _dec("l_extendedprice", 12), _dec("l_discount", 12)
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            o.filter(F.col("o_orderdate") < cutoff),
            li.l_orderkey == o.o_orderkey,
        )
        .join(
            c.filter(F.col("c_mktsegment") == "BUILDING"),
            o.o_custkey == c.c_custkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q6_forecast",
    """
    SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                             * CAST(l_discount AS DECIMAL(12,2))), 0) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: multi-predicate scan-agg (all filters pushed to scan).",
)
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = _dec("l_discount", 12)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & disc.between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(F.sum(_dec("l_extendedprice", 12) * disc), F.lit(0))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q14_promo_ratio",
    """
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                   THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                   ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: LIKE-predicated conditional revenue ratio.",
)
def q_tpch_q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc_price = _dec("l_extendedprice", 12) * (F.lit(1) - _dec("l_discount", 12))
    promo = F.when(F.col("p_type").like("PROMO%"), disc_price).otherwise(F.lit(0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q19_or_predicates",
    """
    SELECT CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                             * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 0)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive predicates across the "
    "join (common-term extraction + pushdown).",
)
def q_tpch_q19_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 30)
    )
    return joined.filter(cond1 | cond2).agg(
        F.coalesce(
            F.sum(_dec("l_extendedprice", 12) * (F.lit(1) - _dec("l_discount", 12))),
            F.lit(0),
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_custkey,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY o.o_orderkey, o.o_custkey
    """,
    doc="TPC-H Q18 shape: IN over a grouped-HAVING subquery. The textbook "
    "plan scans lineitem twice (HAVING aggregate, then re-join + regroup); "
    "because o_orderkey is unique in orders, the post-join regroup is "
    "algebraically the per-order sum, so we aggregate lineitem ONCE and "
    "join the filtered sums to orders — one fact scan and one shuffle "
    "instead of two of each, which is the difference that matters at "
    "100 TB.",
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sums = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity", 12)).alias("q"))
        .filter(F.col("q") > 150)
    )
    return o.join(sums, o.o_orderkey == sums.l_orderkey).select(
        "o_orderkey", "o_custkey", F.col("q").cast("double").alias("total_qty")
    )


@register(
    "tpch_q5_regional",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join with region filter, grouped revenue.",
)
def q_tpch_q5_regional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    price, disc = _dec("l_extendedprice", 12), _dec("l_discount", 12)
    # region filter pushes through the broadcast nation join, pruning the
    # supplier side before the big fact join
    nr = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        n.n_regionkey == r.r_regionkey,
    ).select("n_nationkey", "n_name")
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nr), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"))
    )


@register(
    "tpch_q22_global_sales",
    """
    WITH a AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS total
      FROM customer c2
      WHERE c2.c_acctbal > 0.0
        AND c2.c_nationkey IN (3, 8, 13, 17, 21)
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c, a
    WHERE c.c_nationkey IN (3, 8, 13, 17, 21)
      AND CAST(c.c_acctbal AS DECIMAL(12,2)) * a.n > a.total
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape (adapted: nationkey membership stands in for the "
    "reference's phone prefix, and the no-orders predicate is scoped to "
    "recent orders — every synthetic customer has at least one order): "
    "scalar aggregate subquery broadcast as a one-row cross join, then an "
    "anti join against date-filtered orders. The above-average comparison "
    "uses the exact form value * n > total in DECIMAL on both engines "
    "(order-independent under parallel aggregation), never a double AVG. "
    "Ref: queries/q22.sql in the reference's TPC-H suite.",
)
def q_tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    NATIONS = [3, 8, 13, 17, 21]
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    eligible = c.filter(F.col("c_nationkey").isin(NATIONS))
    # scalar subquery -> 1-row aggregate, broadcast cross join (no shuffle);
    # exact decimal (n, total) instead of a double average
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("c_acctbal", 12)).alias("total"),
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(_dec("c_acctbal", 12) * F.col("n") > F.col("total"))
        # NOT EXISTS -> anti join; the date filter pushes to the orders scan,
        # shrinking the build side before the join
        .join(
            o.filter(
                F.col("o_orderdate")
                >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal", 12)).cast("double").alias("totacctbal"),
        )
    )


@register(
    "tpch_q17_small_qty_revenue",
    # SUM/COUNT instead of AVG for the per-part cap: DuckDB's AVG(DECIMAL)
    # returns DOUBLE while Spark's returns DECIMAL(16,6) — the explicit
    # exact-decimal SUM cast to DOUBLE divided by the BIGINT count is the
    # same arithmetic in both engines, so the cap doubles are bit-equal.
    """
    SELECT CAST(CAST(COALESCE(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 0)
                     AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#4'
    JOIN (
      SELECT l2.l_partkey,
             0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                    / COUNT(*)) AS qty_cap
      FROM lineitem l2
      JOIN part p2 ON p2.p_partkey = l2.l_partkey AND p2.p_brand = 'Brand#4'
      GROUP BY l2.l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS DOUBLE) < a.qty_cap
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): per-part average "
    "quantity as a correlated cap, summed revenue of below-cap line "
    "items / 7. The textbook correlated subquery decorrelates to ONE "
    "aggregate of lineitem grouped by part + a join back; the brand "
    "filter is pushed through BOTH branches (a part's average is over "
    "its own rows only, so restricting the aggregate's input to the "
    "brand's parts first is value-identical and prunes the agg to the "
    "selected ~1/25 of the fact table — the decorrelation + pushdown "
    "pair that matters at 100 TB). Completes the TPC-H Q1-Q22 sweep.",
)
def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#4"
    ).select("p_partkey")
    # no forced broadcast: the brand-filtered part set is ~1/25 of part,
    # which still GROWS with scale — the size-based planner broadcasts it
    # at bench scale and demotes to a spillable shuffle join at 100 TB
    brand_li = li.join(
        p, li.l_partkey == F.col("p_partkey")
    ).drop("p_partkey")
    caps = brand_li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(_dec("l_quantity", 12)).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_cap")
    )
    return (
        brand_li.join(caps, "l_partkey")
        .filter(F.col("l_quantity").cast("double") < F.col("qty_cap"))
        .agg(
            (
                F.coalesce(F.sum(_dec("l_extendedprice", 12)), F.lit(0))
                .cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )
