#!/usr/bin/env python3
"""Decompose a registry entry's bench time: fn() construction (driver-side
collects inside the builder), planning (explain), and execution (noop
write). Also counts Spark jobs triggered during each phase."""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_data_spark import get_spark, release_all
    from etl_data_spark.catalog import REGISTRY

    spark = get_spark(app_name="decompose-r13")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    REGISTRY[names[0]].fn(spark, sf_dir).count()  # warm-up

    print(f"{'query':40s} {'fn_s':>7s} {'plan_s':>7s} {'exec_s':>7s} "
          f"{'fn_jobs':>7s} {'ex_jobs':>7s}")
    for name in names:
        release_all()
        spark.catalog.clearCache()
        jobs_before = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        t1 = time.perf_counter()
        jobs_mid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        jobs_after = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        print(f"{name:40s} {t1-t0:7.2f} {t2-t1:7.2f} {t3-t2:7.2f} "
              f"{jobs_mid-jobs_before:7d} {jobs_after-jobs_mid:7d}")


if __name__ == "__main__":
    sys.exit(main())
