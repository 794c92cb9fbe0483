"""Custom stateful streaming operators (applyInPandasWithState).

Spark's built-in streaming aggregations cover windowed counts; session
boundaries with emit-on-close semantics need per-key state the built-ins
don't expose. ``streaming_sessionize`` keeps ONE open session per key in
the state store (bounded: a few scalars per key, not the events), emits a
session row the moment a gap closes it, and lets the state timeout reap
idle keys — the standard production shape for clickstream sessionization.

``streaming_dedup`` is the built-in path for exact streaming dedup:
``dropDuplicatesWithinWatermark`` bounds the dedup state by event time, so
the state store holds only the watermark horizon, not all history — the
streaming twin of the batch ``dedup_exact`` operator.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)

# open-session state: (start_us, last_us, n_events) — O(1) per key
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)


def _session_fn(gap_us: int, use_timeout: bool = True):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((s, e, n))
            state.remove()
        else:
            ts_us = (
                pd.concat(list(pdfs))["ts"]
                .astype("int64")  # pandas datetime64[us/ns] -> epoch integer
                .sort_values()
            )
            # datetime64[ns] arrives as ns; normalize to us
            if ts_us.size and int(ts_us.iloc[0]) > 10**16:
                ts_us = ts_us // 1000
            start, last, n = state.get if state.exists else (None, None, 0)
            for t in (int(v) for v in ts_us):
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            state.update((start, last, n))
            if use_timeout:
                state.setTimeoutDuration(gap_us // 1000)  # ms

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    timeout: str = GroupStateTimeout.ProcessingTimeTimeout,
) -> DataFrame:
    """Emit closed sessions (start, end, n_events) per key as a stream.

    State is one open session per key; ProcessingTimeTimeout reaps keys
    idle past the gap so the store stays bounded under key churn (pass
    ``GroupStateTimeout.NoTimeout`` for finite replay jobs where
    ``processAllAvailable`` must terminate). Output is append-mode: a
    session row is final the moment it is emitted.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.select(key_col, "ts")
        .groupBy(key_col)
        .applyInPandasWithState(
            _session_fn(gap_us, use_timeout=timeout != GroupStateTimeout.NoTimeout),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps keys only until the watermark
    passes them — at 100 TB/day the state store holds one horizon of keys,
    not the full history a plain dropDuplicates would accumulate.
    """
    keys = key_cols or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
