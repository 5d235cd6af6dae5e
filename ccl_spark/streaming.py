"""Structured Streaming operators.

The reference is batch (slice lists); its temporal semantics — per-label
lifetimes ("ages"), end-of-life detection — map naturally onto streams
of timestamped events. This module provides the streaming versions:

- `windowed_activity`: watermarked tumbling-window counts per key
  (late data handled by the watermark, not by reprocessing);
- `running_ages`: a custom stateful operator via
  ``applyInPandasWithState`` — per key, maintains (first_seen,
  last_seen, n_events, n_days) across microbatches; this is the
  streaming generalization of the reference's m_ages accumulation
  (ccl_marker_stack.py:989-1003).

Tests drive these with a file source + ``trigger(availableNow=True)``
so results are deterministic; production uses the same code over
Kafka/files with continuous triggers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_activity(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts per key with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
        )
    )


AGE_STATE = StructType(
    [
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("n_events", LongType()),
        StructField("n_days", IntegerType()),
    ]
)

AGE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("n_events", LongType()),
        StructField("n_days", IntegerType()),
    ]
)


def _ages_fn(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        first_seen, last_seen, n_events, n_days = state.get
        days = set()
    else:
        first_seen = last_seen = None
        n_events, days = 0, set()
    for pdf in pdf_iter:
        ts = pd.to_datetime(pdf["ts"])
        n_events += len(pdf)
        lo, hi = ts.min(), ts.max()
        first_seen = lo if first_seen is None else min(first_seen, lo)
        last_seen = hi if last_seen is None else max(last_seen, hi)
        days.update(ts.dt.date.unique().tolist())
    # n_days is day-span based so it composes across batches without
    # storing the full day set in state
    n_days = (last_seen.date() - first_seen.date()).days + 1
    state.update((first_seen, last_seen, n_events, n_days))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "first_seen": [first_seen],
            "last_seen": [last_seen],
            "n_events": [n_events],
            "n_days": [n_days],
        }
    )


def running_ages(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator: per-key running lifetime stats."""
    return (
        events.groupBy(F.col(key_col).cast("long").alias("user_id"))
        .applyInPandasWithState(
            _ages_fn,
            outputStructType=AGE_OUTPUT,
            stateStructType=AGE_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
