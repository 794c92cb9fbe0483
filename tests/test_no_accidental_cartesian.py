"""Registry-wide cross-join containment pin (r6).

No registered query may plan a CartesianProduct, and
BroadcastNestedLoopJoin is allowed only for the reviewed allowlist below —
entries whose BNLJ is either a 1-row scalar-aggregate crossjoin (corpus
stats, totals, thresholds: broadcasting one row is free at any scale) or
the explicitly-sanctioned small-corpus exact kNN / all-pairs verification
baselines, which now carry fail-fast row-count guards
(operators/similarity.py knn_join/near_dup_pairs).

Any NEW operator that reaches a BNLJ/cartesian fails here until a human
reviews it onto the list. BNLJ arises only from non-equi/no-condition
joins, so membership is query-shape-determined, not statistics-determined
— the list is stable across scale factors.
"""

import pytest

from etl_data_spark.catalog import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# Entries whose BNLJ nodes were individually reviewed (r6 sweep):
# scalar-aggregate crossjoins unless noted otherwise.
ALLOWED_BNLJ = {
    # sanctioned explicit cross joins (guarded, documented small-corpus)
    "knn_join_sample",
    "embedding_near_dup",
    "cross_join_grid",
    # 1-row scalar-aggregate broadcast crossjoins
    "tfidf_topk",
    "bm25_search",
    "unigram_logprob",
    # seed_pieces' crossJoin(broadcast(total)) — a 1-row piece-count
    # total. Present since the entry's birth but hidden from the FINAL
    # plan by segment_words_viterbi's per-step localCheckpoints; the r13
    # single-expression DP removed those checkpoints, so the (reviewed,
    # 1-row broadcast) cross join now shows in the executed plan.
    "unigram_segment_corpus",
    "funnel_counts",
    "star_build",
    "rrf_hybrid_search",
    "ndcg_bm25",
    "prf_expansion_terms",
    "lang_id_kappa",
    "dedup_threshold_curve",
    "knn_mrr",
    "collocation_pmi",
    "source_kl_divergence",
    "vocab_coverage",
    "mixture_temperature_weights",
    "vocab_growth_curve",
    "keyness_terms",
    "scalar_subquery_above_avg",
    "tpch_q22_global_sales",
    "tpch_q11_important_supply",
    "triangle_count",
    "mutual_info_type_hour",
    "funnel_strict_sequence",
    "mad_value",
    "benford_deviation",
    "rfm_segments",
    "abc_analysis",
    "chi_square_independence",
    "quantile_normalize",
    "weighted_median",
    "equidepth_histogram",
    "target_encoding",
    "drift_psi",
    "winsorized_stats",
    "survival_km",
    "cusum_changepoint",
    "churn_labels",
    "theil_sen_trend",
    "association_rules",
    "brier_decomposition",
    "ks_two_sample",
    "cramers_v",
    "ccf_click_purchase",
    "session_copresence",
    "revenue_bridge",
    "slow_movers",
    # r13 reviewed: 1-row totals frames broadcast onto bounded tables —
    # dsir_* crossjoin (nr, nt) onto the 1024-row bucket model;
    # lm_perplexity crossjoins (n_tokens, v_types) onto the bigram
    # stream. Broadcasting one row is free at any scale.
    "dsir_importance",
    "dsir_select_topk",
    "lm_perplexity",
}


@pytest.mark.slow
def test_no_registry_entry_plans_accidental_cartesian(spark):
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    offenders: list[str] = []
    for name, spec in REGISTRY.items():
        spark.catalog.clearCache()
        plan = (
            spec.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        )
        if "CartesianProduct" in plan:
            offenders.append(f"{name}: CartesianProduct")
        elif "BroadcastNestedLoopJoin" in plan and name not in ALLOWED_BNLJ:
            offenders.append(f"{name}: unreviewed BroadcastNestedLoopJoin")
    assert not offenders, (
        "cross-join containment violated (review the plan, fix the join, "
        f"or allowlist deliberately): {offenders}"
    )


def test_knn_join_guard_blocks_oversized_cross(spark):
    from etl_data_spark.operators import similarity as S

    df = spark.range(20_000).selectExpr(
        "id AS vec_id", "array(cast(id + 1 as float), 1.0f) AS embedding"
    )
    with pytest.raises(ValueError, match="max_pairs"):
        S.knn_join(df, df, k=2)  # 4e8 pairs > default 1e8 guard
    with pytest.raises(ValueError, match="max_pairs"):
        S.near_dup_pairs(df, id_col="vec_id")
    # explicit opt-outs still work
    small = df.limit(50)
    assert S.knn_join(small, small, k=2).count() > 0
    assert S.knn_join(df, df, k=1, allow_cross=True).schema is not None
