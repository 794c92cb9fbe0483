#!/usr/bin/env python3
"""Measure that at-rest incremental dedup costs O(delta), not O(corpus).

VERDICT r11 #1 done-criterion: with the MinHash band table PERSISTED
(``write_minhash_bands``), a fixed-size delta batch's probe must stay
~flat as the BASE corpus grows, while the on-the-fly
``minhash_lsh_pairs_incremental`` — which re-shingles and re-signs the
whole corpus per batch — grows linearly.

Sweep: base corpus = documents duplicated 1x / 4x / 16x (doc ids offset
per replica so every doc is distinct, texts 10x'd so signing cost is
visible over fixed job overhead), delta = a fixed 200-doc batch.
Per corpus size, time (median of REPS):

  A. on-the-fly incremental (full frame + delta predicate)
  B. at-rest probe against a pre-built layout (layout build NOT timed —
     it is the once-per-corpus cost the layout amortizes)

Prints one markdown table ready to paste into SCALE.md.

Usage: python3 tools_dedup_slope.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

from pyspark.sql import functions as F

from etl_data_spark.operators import dedup as D
from etl_data_spark.queries import load_table
from etl_data_spark.session import get_spark

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = "/root/testdata/sf0.1"
DELTA_ROWS = 200


def _replicated(docs, factor: int):
    """factor copies of the corpus with disjoint id ranges (texts are
    perturbed per replica so replicas don't collapse into one giant
    duplicate cluster)."""
    parts = []
    for i in range(factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                # 10x the text so per-doc signing cost is visible over
                # fixed job overhead (the quantity the layout amortizes)
                F.concat(
                    F.array_join(
                        F.array_repeat(F.col("text"), 10), " "
                    ),
                    F.lit(f" replica{i}"),
                ).alias("text"),
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
        # drop the operators' internal pins between reps — otherwise rep
        # 2+ reads the cached shingle/signature frames and the median
        # hides exactly the signing cost under measurement
        release_all()
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn()
        runs.append(time.monotonic() - t0)
    return statistics.median(runs)


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    n_docs = docs.count()

    delta = docs.filter(F.col("doc_id") < DELTA_ROWS).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"), "text"
    )

    # untimed warm-up: JIT/codegen/first-scan costs must not land on the
    # first measured point (they inverted the slope in the first cut)
    warm = tempfile.mkdtemp(prefix="dedup_slope_warm_")
    docs.write.mode("overwrite").parquet(warm + "/corpus")
    wstored = spark.read.parquet(warm + "/corpus")
    D.minhash_lsh_pairs_incremental(
        wstored.unionByName(delta), delta_pred=F.col("doc_id") >= 50_000_000
    ).count()
    D.write_minhash_bands(wstored, warm + "/layout")
    D.dedup_incremental_at_rest(delta, warm + "/layout").count()

    rows = []
    for factor in (1, 4, 16):
        base = _replicated(docs, factor)
        # materialize the base as parquet so both paths read the same
        # at-rest corpus (not a lineage replay)
        tmp = tempfile.mkdtemp(prefix=f"dedup_slope_{factor}x_")
        base.write.mode("overwrite").parquet(tmp + "/corpus")
        stored = spark.read.parquet(tmp + "/corpus")

        full = stored.unionByName(delta)
        t_fly = _timed(
            spark,
            lambda: D.minhash_lsh_pairs_incremental(
                full, delta_pred=F.col("doc_id") >= 50_000_000
            ).count()
        )

        layout = tmp + "/layout"
        D.write_minhash_bands(stored, layout)  # untimed: once per corpus
        t_rest = _timed(
            spark,
            lambda: D.dedup_incremental_at_rest(delta, layout).count()
        )
        rows.append((factor * n_docs, t_fly, t_rest))
        print(f"  [{factor}x done]", file=sys.stderr)

    print("| base docs | on-the-fly incr (s) | at-rest probe (s) |")
    print("|---|---|---|")
    for n, tf, tr in rows:
        print(f"| {n} | {tf:.2f} | {tr:.2f} |")
    f1, fN = rows[0], rows[-1]
    print(
        f"\ncorpus 16x: on-the-fly {fN[1] / f1[1]:.1f}x slower, "
        f"at-rest {fN[2] / f1[2]:.1f}x"
    )


if __name__ == "__main__":
    main()
