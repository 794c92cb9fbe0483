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

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
