"""Invariant tests for the round-3 analytics/retrieval queries — properties
the DuckDB oracles can't express (stability across partitionings, scale
invariants) plus physical-plan pins for the new plan shapes.
"""

import pytest
from pyspark.sql import functions as F

from etl_data_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def q(spark, name):
    return REGISTRY[name].fn(spark, SF)


def plan(df) -> str:
    df.sparkSession.catalog.clearCache()
    return df._jdf.queryExecution().executedPlan().toString()


def test_hash_sample_rate_and_stability(spark):
    """Deterministic sampling: ~p of rows kept, and the SAME rows kept
    regardless of partition count (the property rand()-sampling lacks)."""
    from etl_data_spark.queries import load_table

    total = load_table(spark, SF, "orders").count()
    s1 = q(spark, "hash_sample")
    keys1 = {r["o_orderkey"] for r in s1.collect()}
    # binomial(n, 0.1): allow 4 sigma
    import math

    sigma = math.sqrt(total * 0.1 * 0.9)
    assert abs(len(keys1) - 0.1 * total) < 4 * sigma + 1

    keys2 = {
        r["o_orderkey"]
        for r in q(spark, "hash_sample").repartition(13).collect()
    }
    assert keys1 == keys2


def test_hash_sample_no_shuffle(spark):
    """Membership is decided row-locally: the plan must contain no
    Exchange at all — the 100 TB point of hash sampling."""
    p = plan(q(spark, "hash_sample"))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_stratified_sample_exactly_k_per_stratum(spark):
    rows = q(spark, "stratified_sample").collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert per_lang, "no strata sampled"
    for lang, ids in per_lang.items():
        assert len(ids) == 5, (lang, ids)


def test_funnel_is_monotone(spark):
    r = q(spark, "funnel_counts").collect()[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] >= 0


def test_cohort_day0_equals_cohort_size(spark):
    """Every user is active on their own first day: offset-0 user counts
    summed over cohorts == number of distinct users."""
    from etl_data_spark.queries import load_table

    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    day0 = (
        q(spark, "cohort_retention")
        .filter(F.col("day_offset") == 0)
        .agg(F.sum("n_users"))
        .collect()[0][0]
    )
    assert day0 == n_users


def test_moments_merge_equals_direct(spark):
    """Merged per-day partials must equal a direct single-pass computation
    (numpy, float64) within float tolerance — mergeability is the point."""
    import numpy as np

    from etl_data_spark.queries import load_table

    vals = np.array(
        [
            r["value"]
            for r in load_table(spark, SF, "events")
            .select("value")
            .collect()
            if r["value"] is not None
        ]
    )
    got = q(spark, "moments_merge").collect()[0]
    assert got["n"] == len(vals)
    assert abs(got["mean_value"] - vals.mean()) < 1e-6
    assert abs(got["var_value"] - vals.var(ddof=1)) < 1e-4


def test_transition_counts_conserve_events(spark):
    """Sum of transitions == total events - number of users (each user
    chain of k events has k-1 transitions)."""
    from etl_data_spark.queries import load_table

    e = load_table(spark, SF, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    total = q(spark, "event_transitions").agg(F.sum("n")).collect()[0][0]
    assert total == n_events - n_users


def test_bm25_is_topk_plan(spark):
    p = plan(q(spark, "bm25_search"))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_tfidf_no_python_and_broadcast_stats(spark):
    p = plan(q(spark, "tfidf_topk"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_value_histogram_partial_agg(spark):
    p = plan(q(spark, "value_histogram"))
    assert p.count("HashAggregate") >= 2
    assert "partial" in p


def test_weighted_sample_stability_and_bias(spark):
    """Same sample at any partition count; and weighting is real: the
    sampled docs skew long (mean n_chars above corpus mean)."""
    s1 = [(r["doc_id"], r["priority"]) for r in q(spark, "weighted_sample").collect()]
    s2 = [
        (r["doc_id"], r["priority"])
        for r in q(spark, "weighted_sample").repartition(17).collect()
    ]
    assert sorted(s1) == sorted(s2)

    from etl_data_spark.queries import load_table

    d = load_table(spark, SF, "documents")
    corpus_mean = d.agg(F.avg("n_chars")).collect()[0][0]
    ids = [i for i, _ in s1]
    sample_mean = (
        d.filter(F.col("doc_id").isin(ids)).agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_curate_end2end_postconditions(spark):
    """Composed pipeline output: only eligible docs, valid splits, and no
    near-dup pair fully surviving."""
    out = q(spark, "corpus_curate_end2end")
    rows = out.collect()
    assert rows, "pipeline produced an empty corpus"
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert all(r["quality"] >= 0.5 for r in rows)

    # no surviving near-dup pair: every pair among survivors was dropped
    surviving = {r["doc_id"] for r in rows}
    from etl_data_spark.operators import dedup as D
    from etl_data_spark.operators import text as TX
    from etl_data_spark.queries import load_table

    d = load_table(spark, SF, "documents")
    eligible = d.select(
        "doc_id", "text", TX.quality_score("text").alias("quality")
    ).filter((F.col("quality") >= 0.5) & (F.col("lang") == "en"))
    pairs = D.minhash_lsh_pairs(
        eligible, "doc_id", "text", shingle_n=3, num_hashes=64, bands=16,
        threshold=0.8,
    ).collect()
    for p in pairs:
        assert not (p["id_a"] in surviving and p["id_b"] in surviving), p


def test_ndcg_bounds_and_ideal(spark):
    from etl_data_spark.catalog import REGISTRY

    r = REGISTRY["ndcg_bm25"].fn(spark, "/root/testdata/sf0.001").first()
    assert 0.0 < r.ndcg_at_10 <= 1.0
    assert r.idcg >= r.dcg > 0.0
