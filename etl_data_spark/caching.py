"""Session-scoped cache pinning: the operator self-containment contract.

Several operators persist intermediates that are *part of the plan they
return* (a distinct frame joined twice, an LSH banded frame, partial
rollup buckets). They cannot ``unpersist()`` before returning — the
caller has not materialized yet, and unpersisting a lazy subplan silently
degrades it to recomputation. But leaving them pinned forever grows
executor storage without bound across a long-lived session running many
registry entries.

The contract:

- operators call :func:`pin` instead of ``DataFrame.persist`` — same
  semantics, plus the frame is recorded in a process-local registry;
- consumers call :func:`release_all` once they have materialized the
  result they care about (the bench harness does this between queries;
  the test harness after each oracle comparison; ``__main__`` at the end
  of a pipeline run);
- loop-style operators whose result is lineage-truncated (``
  localCheckpoint``) before return unpersist their scratch frames
  eagerly and never hit the registry at all.

``release_all`` is idempotent and safe to call with queries in flight on
*other* DataFrames: unpersist only marks blocks for eviction and any
still-running job recomputes the subplan.

**Every long-lived entrypoint MUST call** :func:`release_all` (or wrap its
work in :func:`pinned_scope`) after materializing results — the registry
intentionally holds strong references, because SQL-layer caches live in
the JVM CacheManager until an explicit unpersist (GC-based reclaim would
also silently degrade a pinned subplan the caller has not materialized
yet, which is the failure mode this module exists to prevent). A consumer
that never releases accumulates executor storage; :func:`pin` emits a
``RuntimeWarning`` (displayed under default filters, unlike
ResourceWarning) past a high-water mark so that bug is loud, not
silent.
"""

from __future__ import annotations

import warnings
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PINNED: list[DataFrame] = []

# A healthy consumer releases between queries; the widest single plan in
# the repo pins < 10 frames. Hundreds outstanding means someone is looping
# without release_all() — warn loudly instead of leaking quietly.
_LEAK_WARN_THRESHOLD = 128


def pin(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` (default storage level unless given) and record it."""
    df = df.persist(level) if level is not None else df.persist()
    _PINNED.append(df)
    if len(_PINNED) == _LEAK_WARN_THRESHOLD:
        warnings.warn(
            f"{_LEAK_WARN_THRESHOLD} pinned DataFrames outstanding - a "
            "long-lived consumer is not calling "
            "etl_data_spark.caching.release_all() (or use pinned_scope()); "
            "executor storage grows without bound until it does.",
            # RuntimeWarning, not ResourceWarning: default Python warning
            # filters IGNORE ResourceWarning, which would make this
            # high-water mark silent in exactly the production runs it
            # exists to protect
            RuntimeWarning,
            stacklevel=2,
        )
    return df


@contextmanager
def pinned_scope():
    """Scope wrapper for consumers: everything pinned inside the block is
    released on exit (materialize results before leaving the block)."""
    try:
        yield
    finally:
        release_all()


def pinned_count() -> int:
    return len(_PINNED)


def release_all() -> None:
    """Unpersist every frame pinned since the last release."""
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist()
        except Exception:
            # A stopped/replaced SparkContext invalidates the handle; the
            # storage died with the context, so there is nothing to free.
            pass


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut the logical plan here — the per-round step of every iterative
    operator (star contraction, PageRank, BFS, the greedy MMR loop).

    When a checkpoint directory is configured (``setCheckpointDir`` /
    ``SPARK_GRAFT_CHECKPOINT_DIR`` via the session factory), this is a
    RELIABLE checkpoint: blocks go to fault-tolerant storage, so an
    executor loss mid-iteration recomputes from the last round, not from
    the raw input — the behavior a 1000-executor job needs, where some
    executor WILL die during a 20-round contraction. Without one it
    degrades to ``localCheckpoint`` (executor-local blocks, no dir
    needed), which is the right call in a single-JVM local run where
    executor loss means the whole app died anyway.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
