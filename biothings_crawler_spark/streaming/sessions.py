"""Streaming gap-sessionization — the Structured Streaming twin of the
batch operator (operators/sessionize.sessionize).

Uses Spark's built-in ``session_window`` aggregation with a watermark:
in append mode a session row is emitted exactly once, when the
watermark passes the point where the session could still grow (last
event + gap), and the not-yet-final sessions live in the streaming
state store — so a killed query restarted on the same checkpoint
resumes mid-session with no duplicate or lost session rows (pytest
drives exactly that: two AvailableNow rounds on one checkpoint, late
batches advancing the watermark to flush earlier sessions).

Semantics note vs the batch operator: identical boundary behaviour —
session_window merges an event whose timestamp equals the previous
session's end (split only at gap strictly greater than the duration),
which is exactly the batch operator's keep-at-gap contract; the batch
operator now uses the same session_window aggregation (1-us boundary
pinned in tests/test_pipeline_ops.py::test_sessionize_gap_boundaries).
Output columns match the batch operator's epoch-microsecond
convention.

Scale note: state is sharded by the session key across executors; the
watermark bounds state size to the sessions still open within the
lateness horizon — the knob that makes an unbounded stream's
sessionization run in bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 600,
    watermark: str = "10 seconds",
) -> DataFrame:
    """events (streaming; key, ts timestamp) -> one appended row per
    FINALIZED session: (key, n_events, start_us, end_us, duration_us),
    timestamps as epoch-microsecond BIGINTs like the batch operator."""
    # watermarks require TIMESTAMP (not NTZ); the engine pins the
    # session timezone to UTC (session.py), so the cast is wall-clock
    # preserving and unix_micros matches the batch operator's NTZ-epoch
    # microsecond convention
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    us = F.expr(f"unix_micros({ts_col})")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col).alias("key"),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
        )
        .select(
            "key",
            "n_events",
            "start_us",
            "end_us",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        )
    )


def dedup_fetch_stream(
    fetches: DataFrame,
    key_col: str = "url_canon",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exactly-once URL admission — the Structured Streaming
    twin of the batch seen-set (operators/seen.py) for the INTRA-round
    horizon: ``dropDuplicatesWithinWatermark`` keeps the first record
    per key and discards re-fetches arriving within the watermark, with
    state BOUNDED by the watermark instead of growing with the key
    space (the property that makes it runnable against an unbounded
    fetch firehose; the persistent cross-round seen-set stays the
    bloom/cuckoo segment table — this operator only has to keep the
    horizon where duplicates can still arrive out of order).

    A killed query restarted on the same checkpoint neither re-emits
    an admitted key nor loses one (state store + idempotent sink —
    pytest drives two AvailableNow rounds on one checkpoint).
    """
    fetches = fetches.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        fetches.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([key_col])
    )
