#!/usr/bin/env python3
"""Regenerate PLANS.md: physical plans of representative queries at sf0.1."""

from etl_data_spark.session import get_spark

PICK = [
    "pricing_summary",
    "star_join",
    "tpch_q5_regional",
    "topk_orders",
    "dedup_minhash_lsh",
    "range_join_bursts",
    "salted_join_agg",
    "scalar_subquery_above_avg",
    "tpch_q18_large_orders",
    "tpch_q22_global_sales",
    "winnow_fingerprints",
    "sliding_window_agg",
    # round 2: incremental-warehouse + single-shuffle Q21 rewrite
    "tpch_q21_waiting_supplier",
    "cdc_snapshot_diff",
    "cdc_merge_upsert",
    "bitmap_distinct_merge",
    "interval_merge",
    "zorder_layout_stats",
    # round 3: analytics/retrieval + scale star build
    "tfidf_topk",
    "bm25_search",
    "hash_sample",
    "funnel_counts",
    "event_transitions",
    "star_build",
    # round 3 second wave: statistics/graph family
    "regr_daily_trend",
    "gini_revenue",
    "column_profile",
    "basket_pairs",
    "outlier_zscore",
    "corr_matrix",
    "abc_analysis",
    "attribution_first_touch",
    # round 3 third wave: rollup chain, sliding sketches, retrieval fusion,
    # set-similarity join, rank transforms, chunking
    "hypertable_rollup",
    "sliding_distinct_users",
    "rrf_hybrid_search",
    "setsim_join_prefix",
    "quantile_normalize",
    "weighted_median",
    "doc_chunking",
    "chi_square_independence",
    # round 3 fourth wave: temporal correctness, Kimball, feature prep
    "pit_scd2_join",
    "target_encoding",
    "drill_across",
    "mann_whitney_u",
    # round 3 continuation: model eval, link prediction, lexical stats,
    # shard packing
    "roc_auc",
    "pr_curve_points",
    "link_predict_scores",
    "item_item_cosine",
    "collocation_pmi",
    "shard_token_budget",
    "pareto_front",
    # continuation wave 2: retrieval eval, incremental dedup, mining
    "mmr_diverse_topk",
    "dedup_incremental_pairs",
    "frequent_triples",
    "ndcg_bm25",
    "theil_sen_trend",
    "embedding_drift",
    # round 6: star-contraction components end-to-end, the real-codec
    # resize chain (zero-shuffle mapInPandas pipeline), and the
    # BLAS top-k whose local selection became order-deterministic
    "dedup_survivor_docs",
    "multimodal_resize",
    "embedding_topk_vectorized",
    # round 7: the verification-window heavies (plan-audited before their
    # driver window lands, like the r6 wave above)
    "degree_assortativity",
    "session_copresence",
    "spearman_rho",
    "skew_kurtosis",
    "order_reconciliation",
    # round 9: the banded-LSH scale paths (near-dup added r8, kNN join
    # added r9) — plan-audited so the id-only candidate shuffles and the
    # single vector join-back stay visible
    "embedding_near_dup_lsh_banded",
    "knn_join_lsh_banded",
    # round 11: the at-rest serving paths as registry entries — plan-audited
    # so the (band,)bucket/cell PartitionFilters stay visible in the record
    "ann_lsh_topk_at_rest",
    "ann_ivf_topk_at_rest",
    "knn_join_banded_at_rest",
    "multimodal_decode_jpeg",
    "ann_pq_adc_topk",
    "ann_ivfpq_rerank_at_rest",
    # round 12: the at-rest dedup probe (delta-only signing + broadcast
    # banded delta visible), SemDeDup's cell-bounded pair join, and the
    # BPE loop's vocab-sized per-iteration aggregation
    "dedup_incremental_at_rest",
    "semantic_dedup_pairs",
    "semantic_dedup_at_rest",
    "bpe_train_merges",
]


def main() -> None:
    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "120")
    from etl_data_spark.catalog import REGISTRY

    sf = "/root/testdata/sf0.1"
    lines = [
        "# PLANS — physical plans of representative queries at sf0.1",
        "",
        "Generated from `.explain` output (AQE initial plans; broadcast hints,",
        "pushdown, partial aggregation, and join strategies visible). Regenerate",
        "with `python tools_gen_plans.py` after plan-affecting changes.",
        "",
    ]
    for n in PICK:
        df = REGISTRY[n].fn(spark, sf)
        p = df._jdf.queryExecution().executedPlan().toString()
        lines += [f"## {n}", "", "```", p.rstrip()[:4000], "```", ""]
    open("PLANS.md", "w").write("\n".join(lines))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
