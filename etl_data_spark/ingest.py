"""Bronze ingest: truncate-and-load with validity-reject accounting.

Replaces the reference's row-by-row INSERT loop (reference: data-pipeline/
src/load_data_to_db.py:13-56) — its per-row try/except "skip bad rows, count
good ones" semantics become a distributed validity filter + rejected-row
count, and the TRUNCATE+INSERT becomes one overwrite write. NaN -> NULL
coercion (load_data_to_db.py:22-25) is native to Spark's schema path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class IngestReport:
    loaded: int
    rejected: int


def validity_predicate() -> F.Column:
    """Rows a row-wise INSERT into the bronze DDL could not accept.

    Bronze has no CHECK constraints (01_init_all.sql:5-20), so the only
    hard failures are varchar-length overflows; mirror those limits.
    """
    return (
        (F.length("user_id") <= 50)
        & (F.length("user_name") <= 100)
        & (F.coalesce(F.length("product_category") <= 50, F.lit(True)))
        & (F.coalesce(F.length("region") <= 50, F.lit(True)))
        & (F.coalesce(F.length("customer_status") <= 20, F.lit(True)))
    )


def ingest_bronze(df: DataFrame, path: str | None = None) -> tuple[DataFrame, IngestReport]:
    """Filter invalid rows, optionally persist bronze, report counts.

    r13 (guide §1.2 — don't compute things twice): loaded and rejected
    used to be two separate ``count()`` actions, i.e. two full
    evaluations of the upstream plan (for the generated source that is
    two full hash-RNG passes) before the write's third. One aggregation
    computes both counts in a single pass; the same validity predicate
    drives the filter and the conditional count, so the report is
    value-identical.

    Caveat: the predicate is evaluated in two separate actions (the agg
    here, the filter at write time), so a NONDETERMINISTIC source could
    make ``loaded`` diverge from the rows actually written — the same
    exposure the old two-count form had (three evaluations), acceptable
    only because the generated source is deterministic. A real streaming
    source should materialize once (write bronze first, count from the
    written files)."""
    ok = df.filter(validity_predicate())
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(validity_predicate(), F.lit(1))).alias("loaded"),
    ).first()
    loaded = row["loaded"]
    rejected = row["total"] - loaded
    if path is not None:
        ok.write.mode("overwrite").parquet(path)
    return ok, IngestReport(loaded=loaded, rejected=rejected)
