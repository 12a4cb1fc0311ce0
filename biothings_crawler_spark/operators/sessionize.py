"""Gap-based sessionization over the event stream — the batch twin of
Structured Streaming's session windows (the streaming side of this
engine handles cursors/watermarks in streaming/; this operator derives
sessions from the same events at rest).

All arithmetic is integer epoch-microseconds (unix_micros /
epoch_us(ts)), so boundaries and aggregates are cross-engine exact —
no timestamp-format or float-second ambiguity.

Scale shape: one window partitioned by the session key ordered by
(ts, event_id) — per-key ordering is irreducible for sessionization,
so the shuffle is one exchange on the key. Skew = the hottest key's
event count; web-crawl keys (user/host) are bounded per day in
practice, and a pathological key can be pre-split by day before
calling (the boundary-flag + running-sum form composes: sessions never
span the split when the gap exceeds it). The lag/sum window functions
are rank-style (no buffering beyond the frame row), so task memory is
O(1) per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak_col: str,
    gap_seconds: int = 600,
) -> DataFrame:
    """Assign gap-based sessions: a new session starts when the time
    since the previous event of the same key exceeds ``gap_seconds``.
    Returns one row per session: (key, session_idx, n_events,
    start_us, end_us, duration_us) with session_idx 1-based per key in
    time order and timestamps as epoch-microsecond BIGINTs."""
    gap_us = gap_seconds * 1_000_000
    # timestampdiff from a fixed NTZ epoch: timezone-free integer
    # microseconds (unix_micros rejects TIMESTAMP_NTZ, and a cast to
    # TIMESTAMP would re-interpret wall-clock in the session zone)
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak_col)
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(order_tiebreak_col).alias("tb"),
        us.alias("us"),
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("boundary"),
    )
    w2 = (
        Window.partitionBy("key")
        .orderBy("ts", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select(
        "key", "us", F.sum("boundary").over(w2).alias("session_idx")
    )
    return (
        sessions.groupBy("key", "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .select(
            "key",
            F.col("session_idx").cast("long").alias("session_idx"),
            "n_events",
            "start_us",
            "end_us",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        )
    )
