#!/usr/bin/env python3
"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR and print
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end including the action (count of the result),
after a warm-up pass of the session. Queries come from the engine registry,
so bench coverage grows with the catalog.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    # relational core (reference-parity operators)
    "pricing_summary",
    "star_join",
    "daily_trend",
    "latest_per_customer",
    "topk_orders",
    "duplicate_groups",
    "semi_join_active",
    "cleanse_case",
    # extended relational surface
    "rollup_revenue",
    "tpch_q5_regional",
    "scalar_subquery_above_avg",
    "range_join_bursts",
    "salted_join_agg",
    # training-data pipeline operators
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "winnow_fingerprints",
    "embedding_topk",
    "multimodal_decode",
    "session_stats",
    "window_agg_5min",
]

# Reported as their own group (tpch_total / tpch_queries): keeps the
# headline metric comparable across rounds while still tracking the full
# TPC-H shape set per-round. pricing_summary (the Q1 shape) stays headline.
TPCH = [
    "tpch_q2_min_cost_supply",
    "tpch_q3_shipping",
    "tpch_q4_priority_queue",
    "tpch_q6_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_supply",
    "tpch_q12_ship_mode",
    "tpch_q13_custdist",
    "tpch_q14_promo_ratio",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q18_large_orders",
    "tpch_q19_or_predicates",
    "tpch_q20_promotion_supplier",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from etl_data_spark import get_spark
    from etl_data_spark.catalog import REGISTRY

    spark = get_spark(app_name="etl-data-spark-bench")

    names = [n for n in HEADLINE if n in REGISTRY]
    names += [n for n in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",") if n in REGISTRY]

    # Warm up the JVM + parquet footers once, outside timing.
    REGISTRY[names[0]].fn(spark, sf_dir).count()

    def run_group(group: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in group:
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        return timings

    timings = run_group(names)
    tpch_timings = run_group([n for n in TPCH if n in REGISTRY])

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "tpch_total": round(sum(tpch_timings.values()), 4),
                "tpch_queries": tpch_timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
