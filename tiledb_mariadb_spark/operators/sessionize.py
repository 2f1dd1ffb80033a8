"""Gap-based sessionization over an event stream — composition of lag +
cumulative sum windows (pure JVM, no Python boundary).

Batch twin of Structured Streaming's ``session_window`` (the streaming
variant lives in suite/streaming_ops.py).  One shuffle on the user key;
per-key work is linear and streaming-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign a session id per ``key``: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``.  Adds columns
    ``session_id`` (0-based per key) and keeps all input columns.
    Timestamps are compared at microsecond resolution.
    """
    us = F.unix_micros(F.col(ts))
    w = Window.partitionBy(key).orderBy(us)
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
