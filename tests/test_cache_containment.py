"""Operator self-containment: no executor storage left behind.

Operators may persist reusable subplans, but the session must not
accumulate storage across a long sequence of registry entries. Two
contracts are asserted here:

- loop operators whose results are lineage-truncated (graph family,
  geometric median) release their persisted scratch frames before
  returning;
- everything else pins through ``caching.pin`` and is freed by
  ``caching.release_all()`` — the seam bench.py and the test harness
  call between entries.

``localCheckpoint`` blocks live until their RDD is garbage-collected
(that is the mechanism, not a leak), so assertions drain through
GC + ContextCleaner with a bounded poll instead of checking instantly.
"""

import gc
import os
import time

import pytest

from etl_data_spark.caching import pinned_count, release_all
from etl_data_spark.catalog import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Entries that exercise every pin() family: LSH dedup (shingles + bands),
# clustering/survivors, graph loops, retrieval vocab frames, incremental
# dedup, stats persists, the curation pipeline.
CACHE_HEAVY = [
    "dedup_minhash_lsh",
    "dedup_survivor_docs",
    "lpa_communities",
    "bfs_hops",
    "pagerank_copurchase",
    "personalized_pagerank",
    "geometric_median",
    "tfidf_topk",
    "dedup_incremental_pairs",
    "corpus_curate_end2end",
    "hypertable_rollup",
    "audience_overlap",
]


def _cached_blocks(spark):
    """Executor storage via the JVM SparkContext.

    getRDDStorageInfo is @DeveloperApi (stable across 3.x/4.x) but reached
    through private py4j accessors; if a PySpark upgrade moves them, skip
    these containment tests rather than fail them spuriously — the public
    pinned_count() contract is still asserted by the callers.
    """
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return [s for s in infos if s.numCachedPartitions() > 0]
    except AttributeError as e:  # private accessor moved in a PySpark upgrade
        # ONLY the accessor-moved case may skip — a Py4J error from a dying
        # context must FAIL these tests, not silently skip the leak pin
        pytest.skip(f"getRDDStorageInfo unavailable in this PySpark: {e}")


def _drain(spark, timeout=45.0):
    """Poll until executor storage is empty (GC frees checkpoint RDDs)."""
    deadline = time.monotonic() + timeout
    while True:
        left = _cached_blocks(spark)
        if not left or time.monotonic() > deadline:
            return left
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)


def test_no_storage_growth_across_sequential_run(spark):
    release_all()
    spark.catalog.clearCache()
    assert not _drain(spark), "pre-existing storage"

    for name in CACHE_HEAVY:
        assert name in REGISTRY, name
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        del df
        release_all()
        # the pin registry must be drained by release_all every time
        assert pinned_count() == 0, name

    leftover = _drain(spark)
    assert not leftover, [str(s) for s in leftover]


@pytest.mark.parametrize(
    "name", ["lpa_communities", "bfs_hops", "pagerank_copurchase",
             "personalized_pagerank", "geometric_median"]
)
def test_loop_operators_self_release(spark, name):
    """Graph/iterative operators free their scratch frames on their own:
    once the result frame is dropped, storage drains without any
    release_all() call (nothing was pinned)."""
    release_all()
    spark.catalog.clearCache()
    assert not _drain(spark), "pre-existing storage"
    before = pinned_count()
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert pinned_count() == before, "loop operator must not pin"
    del df
    leftover = _drain(spark)
    assert not leftover, [str(s) for s in leftover]


def test_release_all_idempotent(spark):
    release_all()
    release_all()
    df = REGISTRY["dedup_exact"].fn(spark, SF_DIR)
    assert df.count() >= 0
    release_all()
    assert pinned_count() == 0
