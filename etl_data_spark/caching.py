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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PINNED: list[DataFrame] = []


def pin(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """Persist ``df`` (default storage level unless given) and record it."""
    df = df.persist(level) if level is not None else df.persist()
    _PINNED.append(df)
    return df


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
