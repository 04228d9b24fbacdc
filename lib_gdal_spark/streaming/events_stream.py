"""Structured Streaming surface for event tables: session windows.

The streaming twin of ``operators/events.sessionize`` — Spark's built-in
``session_window`` (gap-based dynamic windows, state-store-merged across
micro-batches) computes the same sessions the batch window computes,
and the tests prove batch/stream parity on identical input
(availableNow trigger).

Semantics note: ``session_window`` extends a session while an event
falls inside [start, last_ts + gap) — an event at EXACTLY last_ts + gap
starts a new session, where the batch operator's ``gap_prev > gap_us``
keeps it. The two differ only on that measure-zero microsecond boundary;
pick a gap that is not an exact multiple of your event cadence (real
event-time data never ties at the boundary).

State shape at scale: session state shards by the grouping key across
executors; the watermark bounds how long an open session can wait for
late events before the state store finalizes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "1 day",
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key gap sessions over a streaming DataFrame. Returns
    (key, w_start, w_end, n_events) where w_end = last event + gap
    (session_window's half-open upper bound; subtract the gap to get the
    batch operator's last-event timestamp).

    ``watermark=None`` skips the watermark — required for complete
    output mode in tests; production append-mode streams need one so the
    state store can finalize sessions.
    """
    e = events
    if watermark is not None:
        e = e.withWatermark(ts_col, watermark)
    return (
        e.groupBy(
            F.col(key),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )
