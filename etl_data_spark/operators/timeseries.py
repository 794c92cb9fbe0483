"""Per-key time-series regularization via applyInPandas.

Resampling an irregular event stream onto a fixed grid with forward fill is
inherently per-key sequential (each output row depends on the previous
observation), which built-in Column expressions can't express without a
window per grid point. ``applyInPandas`` is the sanctioned escape hatch: one
Arrow batch per key group, vectorized pandas inside, output partitioned by
the same key — the shuffle moves each key's events once.

At 100 TB the guardrail is group size, not group count: a single key's
events must fit in one executor's memory. For telemetry-style data
(bounded events per user per day) that holds by construction; for hot keys,
pre-split by (key, day) and fill each day independently.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

RESAMPLE_SCHEMA = "user_id long, grid_ts timestamp, value double, filled boolean"


def resample_ffill(
    events: DataFrame,
    freq_minutes: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Resample each key's series to a fixed grid, forward-filling gaps.

    Grid spans each key's [floor(min ts), max ts] at ``freq_minutes``
    resolution; ``filled`` marks grid points with no real observation.
    Duplicate timestamps keep the last value (pandas ``last``).
    """
    freq = f"{freq_minutes}min"

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        series = (
            pdf.set_index(pd.DatetimeIndex(pdf[ts_col]))[value_col]
            .resample(freq)
            .last()
        )
        observed = series.notna()
        filled = series.ffill()
        out = pd.DataFrame(
            {
                "user_id": pdf[key_col].iloc[0],
                "grid_ts": filled.index,
                "value": filled.to_numpy(dtype=float),
                "filled": (~observed).to_numpy(),
            }
        )
        return out

    return (
        events.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(fill, schema=RESAMPLE_SCHEMA)
    )
