#!/usr/bin/env python3
"""Recall measurement for the banded LSH near-dup path (SCALE.md §29).

The r8 slope sweep measured WALL TIME and pair counts for
``near_dup_pairs_lsh_banded`` at 10k/20k/40k rows but not recall vs
exhaustive truth — and recall is the quantity the auto-sizer trades:
planes_per_band grows ceil(log2(n/target)) with the corpus, per-band
recall for a pair with per-plane agreement q decays as q^r, and only the
OR over b bands (1-(1-q^r)^b) compensates. This script measures that
trade empirically so the bands-vs-planes law in SCALE.md rests on
numbers, not algebra alone.

Exhaustive truth per corpus is affordable exactly once: the full n x n
cosine matrix via blocked BLAS on the driver (40k x 64 doubles = 20 MB;
1.6e9 dots ~ seconds of matmul) — this is measurement tooling, NOT an
operator: the engine's exhaustive path stays `near_dup_pairs` and its
guard. Spark-side candidates come from the real operators so the
measurement exercises the same code users run.

Run: python tools_banded_recall.py [--scales 0.5,1.0,2.0] [--threshold 0.4]
One JSON line per (variant, scale); summary table at the end for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

OUT_ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale")


def exhaustive_pairs(mat: np.ndarray, ids: np.ndarray, threshold: float,
                     block: int = 4096) -> set[tuple[int, int]]:
    """All (id_a, id_b) with 6dp-rounded cosine >= threshold, id_a < id_b.
    Blocked upper-triangle BLAS; zero-norm rows get NULL semantics (never
    qualify), matching the operator contract.

    BLAS pairwise summation differs from the engines' sequential fold by
    ~1e-15, which can flip the 6dp round for a pair sitting exactly on the
    threshold boundary — callers therefore compare against truth at the
    nominal threshold for RECALL and against a 2e-6-loosened threshold for
    the precision sanity check (boundary pairs are measurement noise, not
    candidate-generation misses)."""
    norms = np.linalg.norm(mat, axis=1)
    safe = norms.copy()
    safe[safe == 0.0] = np.nan  # NULL contract: never passes the threshold
    unit = mat / safe[:, None]
    truth: set[tuple[int, int]] = set()
    n = len(mat)
    for i0 in range(0, n, block):
        a = unit[i0 : i0 + block]
        for j0 in range(i0, n, block):
            sims = a @ unit[j0 : j0 + block].T
            sims = np.floor(sims * 1e6 + 0.5) / 1e6
            ii, jj = np.where(sims >= threshold)
            for di, dj in zip(ii, jj):
                gi, gj = i0 + di, j0 + dj
                if gi < gj:
                    # order by ID (the operator's id_a < id_b), not by
                    # matrix index — toPandas row order is partition order
                    ia, ib = int(ids[gi]), int(ids[gj])
                    truth.add((ia, ib) if ia < ib else (ib, ia))
    return truth


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="0.5,1.0,2.0")
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument(
        "--target-recall",
        type=float,
        default=None,
        help="also measure the _auto_bands path at this recall floor "
        "(bands solved from 1-(1-q^r)^b at the threshold, growing with "
        "log n alongside the auto-sized codes)",
    )
    args = ap.parse_args()

    from etl_data_spark import get_spark
    from etl_data_spark.operators import similarity as S

    spark = get_spark(app_name="banded-recall")
    rows_out = []
    for s in args.scales.split(","):
        path = os.path.join(OUT_ROOT, f"sf{s}", "embeddings.parquet")
        if not os.path.exists(path):
            print(json.dumps({"sf": s, "skipped": "corpus missing"}))
            continue
        e = spark.read.parquet(path)
        pdf = e.select("vec_id", "embedding").toPandas()
        ids = pdf["vec_id"].to_numpy()
        mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        n = len(ids)
        truth = exhaustive_pairs(mat, ids, args.threshold)
        truth_loose = exhaustive_pairs(mat, ids, args.threshold - 2e-6)
        dim = mat.shape[1]

        def pairs_of(df) -> set[tuple[int, int]]:
            return {(r["id_a"], r["id_b"]) for r in df.collect()}

        auto_p = S._auto_planes(n, 64)
        variants = {
            # the retired parity config: fixed 4 planes, one set
            "single_fixed_p4": S.near_dup_pairs_lsh(
                e, dim=dim, threshold=args.threshold, num_planes=4
            ),
            # the r9 default: one set, auto-sized planes (linear but
            # nothing recovers per-plane recall loss)
            "single_auto": S.near_dup_pairs_lsh(
                e, dim=dim, threshold=args.threshold, n_rows=n
            ),
            # the scale path: auto-sized planes, OR over bands
            f"banded_auto_b{args.bands}": S.near_dup_pairs_lsh_banded(
                e, dim=dim, threshold=args.threshold,
                bands=args.bands, n_rows=n,
            ),
        }
        bands_of = {name: (1 if name.startswith("single") else args.bands)
                    for name in variants}
        if args.target_recall is not None:
            # the r10 law-as-code path: bands solved for the recall floor
            # at this threshold/corpus size (grows with log n where fixed
            # b=4 sags)
            b_auto = S._auto_bands(
                n, args.threshold, args.target_recall, 64,
                planes_per_band=auto_p,
            )
            name = f"banded_target{args.target_recall}"
            variants[name] = S.near_dup_pairs_lsh_banded(
                e, dim=dim, threshold=args.threshold,
                target_recall=args.target_recall, n_rows=n,
            )
            bands_of[name] = b_auto
        for name, df in variants.items():
            got = pairs_of(df)
            assert got <= truth_loose, "verify stage must make precision exact"
            rec = len(got & truth) / max(len(truth), 1)
            row = {
                "variant": name, "sf": s, "rows": n, "auto_planes": auto_p,
                "bands": bands_of[name],
                "truth_pairs": len(truth), "found_pairs": len(got),
                "recall": round(rec, 4),
            }
            rows_out.append(row)
            print(json.dumps(row), flush=True)

    print("\n| variant | rows | planes | bands | truth | found | recall |")
    print("|---|---|---|---|---|---|---|")
    for r in rows_out:
        print(
            f"| {r['variant']} | {r['rows']:,} | {r['auto_planes']} "
            f"| {r['bands']} "
            f"| {r['truth_pairs']:,} | {r['found_pairs']:,} | {r['recall']:.3f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
