"""Bench-harness group lists: a typo'd name would be silently FILTERED
OUT (`[n for n in GROUP if n in REGISTRY]`), shrinking the group and
reading as a speedup in the next round's record. Pin that every listed
name registers, and that no name is benched twice across groups (double
membership would double-count its time in two group totals)."""

import bench

from etl_data_spark.catalog import REGISTRY


def test_every_benched_name_is_registered():
    groups = {
        "HEADLINE": bench.HEADLINE,
        "TPCH": bench.TPCH,
        "SCALE_OPS": bench.SCALE_OPS,
        "STATS": bench.STATS,
        "MEDIA_ANN": bench.MEDIA_ANN,
    }
    missing = {
        g: [n for n in names if n not in REGISTRY]
        for g, names in groups.items()
    }
    missing = {g: m for g, m in missing.items() if m}
    assert not missing, f"bench group names not in REGISTRY: {missing}"


def test_no_query_benched_in_two_groups():
    seen: dict[str, str] = {}
    dupes = []
    for g, names in (
        ("HEADLINE", bench.HEADLINE),
        ("TPCH", bench.TPCH),
        ("SCALE_OPS", bench.SCALE_OPS),
        ("STATS", bench.STATS),
        ("MEDIA_ANN", bench.MEDIA_ANN),
    ):
        for n in names:
            if n in seen:
                dupes.append((n, seen[n], g))
            seen[n] = g
    assert not dupes, f"queries benched in two groups: {dupes}"
