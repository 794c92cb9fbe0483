#!/usr/bin/env python3
"""Measure that the SEMANTIC at-rest incremental probe costs O(delta +
probed cells), not O(corpus) — the r13 twin of tools_dedup_slope.py
(VERDICT r12 missing #4 done-criterion: a per-batch slope row for the
semantic ingest gate).

Sweep: base corpus = embeddings replicated 1x / 4x / 16x (vec ids offset
per replica, a small deterministic per-replica perturbation so replicas
don't collapse into one duplicate cluster) folded into a
``write_ivf_partitioned`` layout; delta = a fixed 200-vector batch.
Per corpus size, time (median of REPS):

  A. on-the-fly ``semantic_dedup_pairs`` over base ∪ delta restricted to
     delta-incident output (the recompute-everything alternative: cells
     retrain + the whole corpus re-assigns per batch)
  B. ``semantic_dedup_incremental_at_rest`` against the pre-built layout
     (layout build NOT timed — the once-per-corpus cost it amortizes)

Prints one markdown table ready to paste into SCALE.md.

Usage: python3 tools_semantic_ingest_slope.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

from pyspark.sql import functions as F

from etl_data_spark.operators import similarity as S
from etl_data_spark.queries import load_table
from etl_data_spark.session import get_spark

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = "/root/testdata/sf0.1"
DELTA_ROWS = 200
THRESHOLD = 0.9


def _replicated(vecs, factor: int):
    parts = []
    for i in range(factor):
        scale = 1.0 + 0.001 * i  # keep replicas distinct but same cells
        parts.append(
            vecs.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.transform(
                    F.col("embedding"), lambda x: x * F.lit(scale)
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _timed(spark, fn) -> float:
    from etl_data_spark import release_all

    runs = []
    for _ in range(REPS):
        release_all()
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn()
        runs.append(time.monotonic() - t0)
    return statistics.median(runs)


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    vecs = load_table(spark, SF, "embeddings").select("vec_id", "embedding")

    delta = vecs.filter(F.col("vec_id") < DELTA_ROWS).select(
        (F.col("vec_id") + 500_000_000).alias("vec_id"), "embedding"
    )

    # untimed warm-up
    warm = tempfile.mkdtemp(prefix="sem_slope_warm_")
    vecs.write.mode("overwrite").parquet(warm + "/corpus")
    wstored = spark.read.parquet(warm + "/corpus")
    S.write_ivf_partitioned(wstored, warm + "/layout")
    S.semantic_dedup_incremental_at_rest(
        delta, warm + "/layout", THRESHOLD
    ).count()
    S.semantic_dedup_pairs(
        wstored.unionByName(delta), threshold=THRESHOLD
    ).filter(
        (F.col("id_a") >= 500_000_000) | (F.col("id_b") >= 500_000_000)
    ).count()

    rows = []
    for factor in (1, 4, 16):
        base = _replicated(vecs, factor)
        tmp = tempfile.mkdtemp(prefix=f"sem_slope_{factor}x_")
        base.write.mode("overwrite").parquet(tmp + "/corpus")
        stored = spark.read.parquet(tmp + "/corpus")

        full = stored.unionByName(delta)
        t_fly = _timed(
            spark,
            lambda: S.semantic_dedup_pairs(full, threshold=THRESHOLD)
            .filter(
                (F.col("id_a") >= 500_000_000)
                | (F.col("id_b") >= 500_000_000)
            )
            .count(),
        )

        S.write_ivf_partitioned(stored, tmp + "/layout")
        t_rest = _timed(
            spark,
            lambda: S.semantic_dedup_incremental_at_rest(
                delta, tmp + "/layout", THRESHOLD
            ).count(),
        )
        rows.append((factor, t_fly, t_rest))
        print(f"{factor}x: on-the-fly {t_fly:.2f}s, at-rest {t_rest:.2f}s",
              flush=True)

    base_fly, base_rest = rows[0][1], rows[0][2]
    print("\n| corpus | on-the-fly delta pairs | at-rest probe |")
    print("|---|---|---|")
    for factor, t_fly, t_rest in rows:
        print(
            f"| {factor}x | {t_fly:.2f}s ({t_fly / base_fly:.1f}x) "
            f"| {t_rest:.2f}s ({t_rest / base_rest:.1f}x) |"
        )


if __name__ == "__main__":
    main()
