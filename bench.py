#!/usr/bin/env python3
"""Benchmark harness: run headline queries at $SPARK_GRAFT_SF_DIR and print
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Method (round 3 — per-group isolation, see BENCH_NOTES.md):
- Groups run in ISOLATED Spark sessions (fresh SparkContext each), headline
  first, so later groups can never pollute the headline numbers via cache
  residue, GC pressure, or JVM state.
- Each group runs SPARK_GRAFT_BENCH_REPS passes (default 2) and reports the
  per-query MINIMUM — the standard defense against transient machine noise
  (the round-2 'regression' was a near-uniform ~20-40% slowdown across
  queries whose code and plans had not changed, i.e. harness/environment
  noise, which min-of-reps suppresses).
- The session cache is cleared between queries so persisted subplans from
  one query (dedup shingle/band caches) can't serve — or evict — another's.
- Timing is end-to-end per query including planning, via a noop-format
  write (full materialization of every output column).

The headline group is the round-1 set of 21 queries, unchanged, so `value`
stays comparable across rounds. TPC-H and the round-3 scale-ops group are
reported separately (tpch_total / scale_ops_total).
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
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_or_predicates",
    "tpch_q20_promotion_supplier",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales",
]

# Round-3 additions: the star-schema build at bench scale plus the
# analytics/retrieval and incremental-warehouse families.
SCALE_OPS = [
    "star_build",
    "tfidf_topk",
    "bm25_search",
    "unigram_logprob",
    "hash_sample",
    "stratified_sample",
    "funnel_counts",
    "cohort_retention",
    "event_transitions",
    "value_histogram",
    "moments_merge",
    "cdc_snapshot_diff",
    "scd2_apply",
    "bitmap_distinct_merge",
    "hll_incremental_distinct",
    "interval_merge",
    "zorder_layout_stats",
    "streaming_window_counts",
    "dedup_minhash_lsh_native",
    "weighted_sample",
    "corpus_curate_end2end",
    "dedup_survivor_docs",
    "hypertable_rollup",
    "sliding_distinct_users",
    "pit_scd2_join",
    "accumulating_snapshot",
    "late_arriving_dim",
    "junk_dimension",
    "drill_across",
    "embedding_gram_matrix",
    "rrf_hybrid_search",
    "passage_overlap",
    "setsim_join_prefix",
    "doc_chunking",
    "duplicate_spans",  # r13: substring-level dedup report (born r13)
    "remove_duplicate_spans",  # r13: the ExactSubstr cut (born r13)
    "dsir_importance",  # r13: DSIR data-mixing weights (born r13)
    "dsir_select_topk",  # r13: Gumbel-top-k weighted selection (born r13)
    "lm_perplexity",  # r13: interpolated-bigram quality gate (born r13)
    "duplicate_spans_incremental_at_rest",  # r13: at-rest gram-index probe
]

# Round-3 statistics/profiling/graph family (queries_stats.py).
STATS = [
    "regr_daily_trend",
    "corr_matrix",
    "calendar_dim",
    "regex_surface",
    "rfm_segments",
    "abc_analysis",
    "attribution_first_touch",
    "funnel_strict_sequence",
    "benford_deviation",
    "mad_value",
    "outlier_robust_z",
    "bag_set_ops",
    "basket_pairs",
    "triangle_count",
    "pagerank_copurchase",
    "lpa_communities",
    "column_profile",
    "document_profile",
    "event_entropy",
    "mutual_info_type_hour",
    "outlier_zscore",
    "rolling_stats",
    "gini_revenue",
    "fuzzy_name_match",
    "countmin_heavy_hitters",
    "streaming_dedup_keys",
    "streaming_stream_join",
    "streaming_static_enrich",
    "streaming_dq_counts",
    "bfs_hops",
    "chi_square_independence",
    "welch_t_test",
    "quantile_normalize",
    "seasonal_anomaly",
    "weighted_median",
    "entity_resolution",
    "forecast_backtest",
    "equidepth_histogram",
    "session_paths",
    "dq_expectations",
    "target_encoding",
    "drift_psi",
    "feature_hashing",
    "graph_clustering_coeff",
    "impute_group_median",
    "interpolate_linear",
    "winsorized_stats",
    "mann_whitney_u",
    "lag_features",
    "k_anonymity",
    "seasonal_decompose",
    "ab_test_lift",
    "ewma_level",
    "survival_km",
    "cohort_ltv",
    "roc_auc",
    "pr_curve_points",
    "calibration_bins",
    "link_predict_scores",
    "item_item_cosine",
    "collocation_pmi",
    "bpe_pair_merge_counts",
    "zipf_slope",
    "cusum_changepoint",
    "shard_token_budget",
    "attribution_linear",
    "l_diversity",
    "pareto_front",
    "holt_linear",
    "streaming_late_data_drop",
    "mmr_diverse_topk",
    "churn_labels",
    "contrastive_negatives",
    "source_kl_divergence",
    "vocab_coverage",
    "fd_discovery",
    "join_skew_report",
    "frequent_triples",
    "dedup_incremental_pairs",
    "theil_sen_trend",
    "forecast_conformal",
    "personalized_pagerank",
    "group_kfold",
    "association_rules",
    "brier_decomposition",
    "ndcg_bm25",
    "embedding_drift",
    "diff_in_diff",
    "missing_days_report",
    "posting_lists",
    "degree_assortativity",
    "lang_id_kappa",
    "geometric_median",
    "packing_efficiency",
    "corpus_export_manifest",
    "ks_two_sample",
    "cramers_v",
    "dedup_cluster_sizes",
    "spearman_rho",
    "ccf_click_purchase",
    "dedup_threshold_curve",
    "audience_overlap",
    "order_reconciliation",
    "fk_orphan_report",
    "mixture_temperature_weights",
    "cdc_net_changes",
    "skew_kurtosis",
    "source_overlap_pairs",
    "prf_expansion_terms",
    "knn_mrr",
    "session_entry_exit",
    "concentration_trend",
    "new_vs_returning",
    "ab_test_mde",
    "char_entropy",
    "vocab_growth_curve",
    "monthly_quantile_bands",
    "session_length_histogram",
    "purchase_cadence",
    "keyness_terms",
    "gains_table",
    "session_copresence",
    "revenue_bridge",
    "rfm_migration",
    "supplier_hhi",
    "price_realization",
    "mktsegment_profile",
    "shipping_lag_profile",
    "return_rate_by_brand",
    "brand_cross_shopping",
    "nation_trade_balance",
    "slow_movers",
    "supplier_risk_screen",
    "size_price_regression",
    "priority_mix_trend",
]


# Effective-core evidence for the driver (r14, VERDICT r13 #2): the r13
# scaling audit fired `suspect_cpus_ignored` because nothing in the bench
# output RECORDED the core count the sessions actually ran with — the env
# var is honored (session.py builds master local[$SPARK_GRAFT_CPUS]), but
# sf0.1 rows are latency-bound so 8c/32c ratios sit near 1 and the record
# could not distinguish "ignored" from "latency-bound". Captured from the
# first live session and echoed in the final JSON line and the sidecar.
_EFFECTIVE: dict[str, object] = {}


def _record_effective(spark) -> None:
    if not _EFFECTIVE:
        sc = spark.sparkContext
        _EFFECTIVE["master"] = sc.master
        _EFFECTIVE["default_parallelism"] = sc.defaultParallelism


def run_group(names: list[str], sf_dir: str, reps: int) -> dict[str, float]:
    """Time one group in a fresh, isolated Spark session."""
    from etl_data_spark import get_spark, release_all
    from etl_data_spark.catalog import REGISTRY

    spark = get_spark(app_name="etl-data-spark-bench")
    _record_effective(spark)
    try:
        # Warm up the JVM + parquet footers once, outside timing.
        REGISTRY[names[0]].fn(spark, sf_dir).count()

        best: dict[str, float] = {}
        for _ in range(reps):
            for name in names:
                release_all()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = REGISTRY[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if name not in best or dt < best[name]:
                    best[name] = dt
        release_all()
        spark.catalog.clearCache()
        return {n: round(t, 4) for n, t in best.items()}
    finally:
        spark.stop()


# Media/ANN/dedup showcase entries that previously had NO bench record
# (r7): every r6/r7 changed-code-path entry now leaves a timing trail —
# the r6→r7 watch-item lesson was that unbenched paths can't be bisected.
MEDIA_ANN = [
    "multimodal_embed",
    "multimodal_frame_sample",
    "multimodal_audio_stats",
    "multimodal_audio_frames",
    "multimodal_resize",
    "embedding_topk_vectorized",
    "knn_join_sample",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # embedding_near_dup is deliberately ABSENT: it is the O(n^2)
    # exact-verification baseline (~71s at sf0.1, measured r7 — it would
    # double the whole bench's wall-clock); its changed guard code path
    # is shared with and covered by knn_join_sample above, and its scale
    # path is the next entry.
    "embedding_near_dup_lsh",
    "embedding_near_dup_lsh_banded",  # corpus-scale banded variant (r8)
    "knn_join_lsh_banded",  # corpus-scale banded kNN join (r9)
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "multimodal_decode_jpeg",  # r11: JPEG marker-walk decode (born r11)
    "ann_pq_rerank_topk",  # r11: PQ ADC + exact rerank (born r11)
    "ann_ivfpq_rerank_at_rest",  # r11: composed IVF-PQ layout (born r11)
    "semantic_dedup_survivors",  # r12: SemDeDup pairs -> components (born r12)
    "bpe_train_merges",  # r12: iterative BPE merge loop (born r12)
    "bpe_segment_corpus",  # r12: tokenizer apply side (born late-r12)
    "ann_sq8_rerank_topk",  # r12: SQ8 + exact rerank (born late-r12)
    "ann_opq_rerank_topk",  # r13: OPQ rotation + PQ + rerank (born r13)
    "unigram_segment_corpus",  # r13: SentencePiece Viterbi DP (born r13)
]


def run_at_rest_group(sf_dir: str, reps: int) -> dict[str, float]:
    """At-rest ANN serving paths (r11, VERDICT r10 #5): the three probe
    paths that were slope-suite-only — regressions now show in BENCH_rN,
    not only in manually-run tools. Layouts are built UNTIMED in group
    setup (same convention as tools_scale_slope's prepare hooks; layout
    build cost has its own slope rows); only the serving probes are
    timed. Sizing mirrors the slope suite (1024-row buckets/cells — the
    file-health knob, SCALE.md §30)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_data_spark import get_spark, release_all
    from etl_data_spark.operators import dedup as D
    from etl_data_spark.operators import similarity as S
    from etl_data_spark.queries import load_table

    spark = get_spark(app_name="etl-data-spark-bench-at-rest")
    root = tempfile.mkdtemp(prefix="bench_at_rest_")
    try:
        e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        dim = len(e.first()["embedding"])
        qvec = list(e.filter(F.col("vec_id") == 0).first()["embedding"])
        lsh, ivf, banded = f"{root}/lsh", f"{root}/ivf", f"{root}/banded"
        S.write_ann_bucketed(e, lsh, dim=dim, target_bucket_rows=1024)
        S.write_ivf_partitioned(e, ivf, centroids=None, target_cell_rows=1024)
        S.write_ann_banded(e, banded, dim=dim, bands=4, target_bucket_rows=1024)
        left = e.filter(F.col("vec_id") < 20)
        # r12: the text-dedup twin — band table + shingles persisted
        # untimed, the per-batch probe timed (the quantity that must
        # track |delta|, not |corpus|)
        d = load_table(spark, sf_dir, "documents")
        bands_path = f"{root}/minhash_bands"
        D.write_minhash_bands(d.filter(F.col("doc_id") < 400), bands_path)
        delta = d.filter(F.col("doc_id") >= 400)
        # r12: the SERVING-ONLY IVF-PQ row the r11 note asked for — the
        # registry entry ann_ivfpq_rerank_at_rest stays self-contained
        # (train+build+serve, so the correctness gate covers the whole
        # path) and is build-dominated; this bench-only row isolates the
        # probe against a prebuilt layout (residual encoding, auto
        # quantizers), the number a serving deployment actually pays.
        from etl_data_spark.operators import pq as PQ

        ivfpq = f"{root}/ivfpq"
        PQ.write_ivf_pq(e, ivfpq, target_cell_rows=1024)
        # r13: the OPQ twin — rotation trained at (untimed) write, stored
        # in the sidecar; the probe rotates only the QUERY driver-side,
        # so this row should read ~equal to ann_ivfpq_serving_probe
        # (that equality IS the claim: serving never pays the rotation)
        opq = f"{root}/opq"
        PQ.write_ivf_pq(e, opq, target_cell_rows=1024, opq=True)
        queries = {
            "ann_lsh_topk_at_rest": lambda: S.ann_topk_at_rest(
                spark, lsh, qvec, k=10
            ),
            "ann_ivf_topk_at_rest": lambda: S.ivf_topk_at_rest(
                spark, ivf, qvec, k=10, n_probe=3
            ),
            "knn_join_banded_at_rest": lambda: S.knn_join_lsh_banded_at_rest(
                spark, left, banded, k=3
            ),
            "dedup_incremental_at_rest": lambda: D.dedup_incremental_at_rest(
                delta, bands_path, threshold=0.8
            ),
            "semantic_dedup_at_rest": lambda: S.semantic_dedup_pairs_at_rest(
                spark, ivf, threshold=0.4
            ),
            "ann_ivfpq_serving_probe": lambda: PQ.ivfpq_topk_at_rest(
                spark, ivfpq, qvec, k=10, n_probe=3, shortlist=50
            ),
            "ann_opq_serving_probe": lambda: PQ.ivfpq_topk_at_rest(
                spark, opq, qvec, k=10, n_probe=3, shortlist=50
            ),
        }
        next(iter(queries.values()))().count()  # warm-up, untimed
        best: dict[str, float] = {}
        for _ in range(reps):
            for name, fn in queries.items():
                release_all()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if name not in best or dt < best[name]:
                    best[name] = dt
        return {n: round(t, 4) for n, t in best.items()}
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def run_pipeline_group(sf: float, reps: int) -> dict[str, float]:
    """Time the FULL reference pipeline as one measured unit (mirrors the
    reference's main.py:6-39): generate -> bronze -> cleanse (parquet,
    month-partitioned) -> star build (4 dims + fact) -> 5-check DQ ->
    windowed mart export. Row count scales with the bench SF (2M rows per
    sf=1.0 -> 200k at the default sf0.1) so the number tracks data volume
    like every other group. All layer writes land in a throwaway dir;
    timing includes them deliberately — the pipeline's cost IS its writes.
    """
    import shutil
    import tempfile

    from etl_data_spark import get_spark, release_all
    from etl_data_spark.pipeline import run_pipeline

    rows = max(1_000, int(2_000_000 * sf))
    spark = get_spark(app_name="etl-data-spark-bench-pipeline")
    try:
        best: float | None = None
        for rep in range(reps + 1):  # rep 0 = warm-up (JVM + codegen), untimed
            wh = tempfile.mkdtemp(prefix="bench_pipeline_wh_")
            try:
                release_all()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                res = run_pipeline(spark, rows=rows, warehouse=wh)
                # every layer is already materialized by its parquet write;
                # touch the DQ summary to close the last action
                res.dq_results.count()
                dt = time.perf_counter() - t0
            finally:
                shutil.rmtree(wh, ignore_errors=True)
            if rep > 0 and (best is None or dt < best):
                best = dt
        release_all()
        spark.catalog.clearCache()
        return {"pipeline_end2end": round(best, 4)}
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))

    from etl_data_spark.catalog import REGISTRY

    extra = [
        n
        for n in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",")
        if n in REGISTRY
    ]
    groups = [
        ("headline", [n for n in HEADLINE if n in REGISTRY] + extra),
        ("tpch", [n for n in TPCH if n in REGISTRY]),
        ("scale_ops", [n for n in SCALE_OPS if n in REGISTRY]),
        ("stats", [n for n in STATS if n in REGISTRY]),
        ("media_ann", [n for n in MEDIA_ANN if n in REGISTRY]),
    ]

    results: dict[str, dict[str, float]] = {}
    for gname, names in groups:
        if names:
            results[gname] = run_group(names, sf_dir, reps)
    # at-rest ANN serving probes ride the media_ann group (r11): layouts
    # built untimed in setup, probes timed in their own isolated session
    results.setdefault("media_ann", {}).update(run_at_rest_group(sf_dir, reps))
    sf_num = float(sf) if sf.replace(".", "").isdigit() else 0.1
    results["pipeline"] = run_pipeline_group(sf_num, reps)

    timings = results.get("headline", {})
    tpch_timings = results.get("tpch", {})
    ops_timings = results.get("scale_ops", {})
    stats_timings = results.get("stats", {})
    media_timings = results.get("media_ann", {})
    pipeline_timings = results.get("pipeline", {})
    total = round(sum(timings.values()), 4)
    method = (
        f"min-of-{reps} reps, isolated session per group, "
        "cache cleared between queries, noop-write materialization"
    )
    # Stamp the measured commit so record<->code can be matched exactly
    # (r5 verdict: two HEAD-labeled artifacts disagreed inside noise band).
    try:
        import subprocess

        git_sha = subprocess.run(
            ["git", "describe", "--always", "--dirty"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or None
    except Exception:
        git_sha = None
    # Full per-query detail goes to a sidecar file: the driver captures only
    # the tail of stdout, and ~280 per-query timings on one line truncate
    # the headline total right out of the record (BENCH_r03/r04 both
    # parsed: null). The FINAL stdout line stays compact — headline total,
    # group totals, and the 21 headline per-query times only.
    # Sidecar is named per effective core count (r14, VERDICT r13 #3): the
    # r13 8-core scaling run silently clobbered the 32-core sidecar, making
    # per-query non-headline numbers unrecoverable and two byte-unchanged
    # entries look "regressed" purely cross-core. SPARK_GRAFT_BENCH_DETAIL
    # still overrides for explicit runs.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(__file__), f"bench_detail_c{cpus}.json"),
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "tpch_total": round(sum(tpch_timings.values()), 4),
                "tpch_queries": tpch_timings,
                "scale_ops_total": round(sum(ops_timings.values()), 4),
                "scale_ops_queries": ops_timings,
                "stats_total": round(sum(stats_timings.values()), 4),
                "stats_queries": stats_timings,
                "media_ann_total": round(sum(media_timings.values()), 4),
                "media_ann_queries": media_timings,
                "pipeline_total": round(sum(pipeline_timings.values()), 4),
                "pipeline_queries": pipeline_timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(cpus) if cpus.isdigit() else cpus,
                "master": _EFFECTIVE.get("master"),
                "default_parallelism": _EFFECTIVE.get("default_parallelism"),
                "method": method,
                "git_sha": git_sha,
            },
            f,
            indent=1,
        )
    print(f"detail: {detail_path}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "tpch_total": round(sum(tpch_timings.values()), 4),
                "scale_ops_total": round(sum(ops_timings.values()), 4),
                "stats_total": round(sum(stats_timings.values()), 4),
                "media_ann_total": round(sum(media_timings.values()), 4),
                "pipeline_total": round(sum(pipeline_timings.values()), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # effective-parallelism echo (r14): lets the driver verify
                # the CPU contract against what the sessions actually ran
                # with, instead of inferring it from latency-bound ratios
                "cpus": int(cpus) if cpus.isdigit() else cpus,
                "master": _EFFECTIVE.get("master"),
                "default_parallelism": _EFFECTIVE.get("default_parallelism"),
                "method": method,
                "git_sha": git_sha,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
