"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in ``session.py``) handles most runtime skew;
salting is the manual tool for the cases AQE can't fix — a single hot key
whose hash partition exceeds executor memory, or skewed aggregation state.

- ``salted_join``: replicate the small side across ``n_salts`` salt values
  and scatter the skewed side by a deterministic salt, turning one hot hash
  partition into ``n_salts`` even ones. Result is row-identical to the
  plain join (the salt is join-key-affine), so the operator is
  oracle-checkable against the unsalted SQL.
- ``two_phase_agg``: group by (key, salt) then by key — for aggregation
  states that don't combine cheaply map-side (collect_set/distinct-heavy),
  where one hot key would otherwise funnel into a single reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int, *scatter_cols: str) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of scatter columns (row
    identity columns, NOT the skewed key — hashing the skewed key alone
    would put the hot key's rows back into one bucket)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in scatter_cols]), F.lit(n_salts))
    )


def explode_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row once per salt value (the broadcast/small side)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    scatter_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join robust to a hot key on the skewed side.

    The skewed side scatters its rows over ``n_salts`` buckets; the small
    side is replicated n_salts-fold (cost: n_salts x |small| rows through
    the shuffle — chosen so |small| * n_salts stays << |skewed|). The join
    key becomes (on..., salt), so each hot key's rows spread over n_salts
    reducers. Row-for-row equal to ``skewed.join(small, on, how)``.

    Reach for this LAST: if the small side fits the broadcast threshold, a
    plain ``F.broadcast`` join is strictly better (no n_salts replication,
    no shuffle at all), and AQE's skew-join splitting handles moderate skew
    automatically. Salting is for the residual case — a shuffle join whose
    hot key AQE cannot split (e.g. a single key larger than one executor's
    share joined against a not-broadcastable side).

    ``scatter_cols`` defaults to ROW IDENTITY (a hash over all of the
    skewed side's columns): hashing the join key alone would put every row
    of the hot key into one salt bucket, silently disabling the operator.
    Pass explicit scatter columns when a cheaper stable row id exists.

    Only ``inner`` and ``left`` joins are supported: under right/full outer
    joins, a small-side row with no skewed-side match would surface once per
    salt replica (n_salts duplicates), so those semantics are refused rather
    than silently wrong.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "outer joins would emit each unmatched small-side row once per "
            "salt replica"
        )
    scatter = scatter_cols or list(skewed.columns)
    left = with_salt(skewed, n_salts, *scatter)
    right = explode_salts(small, n_salts)
    return left.join(right, on=[*on, SALT_COL], how=how).drop(SALT_COL)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    scatter_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for re-aggregable measures (sum/count/min/max):
    phase 1 groups by (keys, salt) so a hot key's input spreads over
    ``n_salts`` reducers; phase 2 combines the per-salt partials by key.

    ``aggs`` maps output column name -> phase-1 aggregate expression; phase
    2 re-combines by name with the matching combiner (sum for sum/count,
    min for min, max for max).

    Like ``salted_join``, ``scatter_cols`` defaults to row identity (all
    columns) — scattering by the group keys themselves would hash each hot
    key's rows into a single salt bucket and change nothing.
    """
    scatter = scatter_cols or list(df.columns)
    salted = with_salt(df, n_salts, *scatter)
    phase1 = salted.groupBy(*keys, SALT_COL).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    combiners = []
    for name in aggs:
        low = name.lower()
        if low.startswith("min"):
            combiners.append(F.min(name).alias(name))
        elif low.startswith("max"):
            combiners.append(F.max(name).alias(name))
        else:  # sums and counts both recombine by sum
            combiners.append(F.sum(name).alias(name))
    return phase1.groupBy(*keys).agg(*combiners)
