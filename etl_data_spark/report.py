"""DQ reporting: check-run report + dashboard aggregations.

Reimplements the read paths of the reference (reference: data-pipeline/src/
run_data_quality_checks.py:40-87 and dq_dashboard.py:22-212) as DataFrame
aggregations over the DQ results table. Rendering stays driver-side text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_batch(results: DataFrame) -> DataFrame:
    """Rows of the most recent execution (run_data_quality_checks.py:40-48).

    The scalar-subquery MAX filter becomes a broadcast semi-join against the
    1-row max — no full-table second scan ordering issues at scale.
    """
    mx = results.agg(F.max("execution_date").alias("execution_date"))
    return results.join(F.broadcast(mx), on="execution_date", how="left_semi").orderBy(
        "check_id"
    )


def summary_stats(results: DataFrame, days_back: int = 7) -> DataFrame:
    """Overall totals for the last N days (dq_dashboard.py:30-43)."""
    recent = results.filter(
        F.col("execution_date") >= F.date_sub(F.current_date(), days_back)
    )
    return recent.agg(
        F.count(F.lit(1)).alias("total_checks"),
        F.count(F.when(F.col("status") == "passed", 1)).alias("passed"),
        F.count(F.when(F.col("status") == "failed", 1)).alias("failed"),
        F.count(F.when(F.col("status") == "error", 1)).alias("errors"),
        F.round(
            F.count(F.when(F.col("status") == "passed", 1))
            * 100.0
            / F.nullif(F.count(F.lit(1)), F.lit(0)),
            2,
        ).alias("success_rate"),
    )


def stats_by_type(results: DataFrame) -> DataFrame:
    """Per-check-type rollup with success rate (dq_dashboard.py:66-79)."""
    return (
        results.groupBy("check_type")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count(F.when(F.col("status") == "passed", 1)).alias("passed"),
            F.count(F.when(F.col("status") == "failed", 1)).alias("failed"),
            F.count(F.when(F.col("status") == "error", 1)).alias("errors"),
            F.round(
                F.count(F.when(F.col("status") == "passed", 1))
                * 100.0
                / F.nullif(F.count(F.lit(1)), F.lit(0)),
                2,
            ).alias("success_rate"),
        )
        .orderBy("check_type")
    )


def recent_checks(results: DataFrame, n: int = 10) -> DataFrame:
    """Most recent N check rows (dq_dashboard.py:94-104). TakeOrderedAndProject."""
    return results.orderBy(
        F.desc("execution_date"), F.desc("check_id")
    ).limit(n)


def daily_trend(results: DataFrame) -> DataFrame:
    """Per-day success trend (dq_dashboard.py:120-131)."""
    return (
        results.groupBy(F.to_date("execution_date").alias("check_date"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count(F.when(F.col("status") == "passed", 1)).alias("passed"),
            F.round(
                F.count(F.when(F.col("status") == "passed", 1))
                * 100.0
                / F.nullif(F.count(F.lit(1)), F.lit(0)),
                2,
            ).alias("success_rate"),
        )
        .orderBy("check_date")
    )


def critical_issues(results: DataFrame, n: int = 5) -> DataFrame:
    """Latest failed/error rows (dq_dashboard.py:147-157)."""
    return (
        results.filter(F.col("status").isin("failed", "error"))
        .orderBy(F.desc("execution_date"), F.desc("check_id"))
        .limit(n)
    )


def render_dashboard(results: DataFrame, days_back: int = 7) -> str:
    """Text dashboard like dq_dashboard.py:22-212 (driver-side render)."""
    lines = ["=" * 60, "DATA QUALITY DASHBOARD", "=" * 60]
    s = summary_stats(results, days_back).first()
    lines.append(
        f"Last {days_back}d: total={s['total_checks']} passed={s['passed']} "
        f"failed={s['failed']} errors={s['errors']} rate={s['success_rate']}%"
    )
    lines.append("-" * 60)
    for r in stats_by_type(results).collect():
        lines.append(
            f"{r['check_type']:>14}: {r['passed']}/{r['total']} passed "
            f"({r['success_rate']}%)"
        )
    lines.append("-" * 60)
    for r in critical_issues(results).collect():
        lines.append(
            f"CRITICAL {r['check_type']}/{r['check_name']}: {r['error_message']}"
        )
    return "\n".join(lines)
