"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval) join — composed from DataFrame primitives so Catalyst still
owns the physical plan (no mapPartitions, no Python).

As-of join (enrich each event with the most recent dimension snapshot
at event time — e.g. a fetch with the robots/politeness config in
force when it happened): implemented as the union-window trick. Tag
right rows 0 and left rows 1, union, and take
``last(value, ignorenulls) OVER (PARTITION BY key ORDER BY ts, tag)``
— each left row sees exactly the latest right row with
``r.ts <= l.ts``. One shuffle on the key, one ordered window, O(1)
frames; versus a naive inequality join this is O((N+M) log) instead
of O(N*M). DuckDB's native ASOF JOIN is the oracle (q_asof_join), so
the composed operator is checked against an independent built-in
implementation of the semantics.

Range join (points x intervals): the naive non-equi join plans a
nested loop — O(N*M). ``bucketed_range_join`` maps points to
``ts div w`` buckets and explodes each interval to the buckets it
covers, turning the join into an equi-join on the bucket key plus an
exact range filter: O(N + M * span/w) hash join, shuffled on a key
both sides share. Pick ``w`` near the typical interval span so each
interval explodes to ~2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    value_col: str,
) -> DataFrame:
    """For every left row, attach ``value_col`` from the latest right
    row of the same key with right_ts <= left_ts (NULL when none).
    Returns the left columns plus ``value_col``. Right (key, ts) pairs
    should be unique — with duplicates, the largest value at the tied
    timestamp wins deterministically.

    The as-of value is a function of (key, left_ts) alone, so the
    union-window runs over a SLIM 4-column frame — distinct left
    (key, ts) probes ∪ right (key, ts, value) rows — and the resulting
    (key, ts) → value mapping is equi-joined back to the full left row.
    A wide left table never rides through the window sort and right
    rows never carry NULL-cast copies of left columns (the r2
    schema-doubling note); the price is one distinct + one equi-join,
    both keyed on (key, ts), which AQE turns into a broadcast when the
    mapping is small."""
    lcols = left.columns
    probes = (
        left.select(
            F.col(key_col).alias("__k"), F.col(left_ts_col).alias("__ts")
        )
        .distinct()
        .select(
            "__k",
            "__ts",
            F.lit(1).alias("__tag"),
            F.lit(None).cast(right.schema[value_col].dataType).alias("__val"),
        )
    )
    r = right.select(
        F.col(key_col).alias("__k"),
        F.col(right_ts_col).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(value_col).alias("__val"),
    )
    # order by (ts, tag, value): right rows sort before left at equal
    # ts (<= semantics); among tied right rows the last = max value
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag", "__val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mapping = (
        r.unionByName(probes)
        .select("__k", "__ts", "__tag",
                F.last("__val", ignorenulls=True).over(w).alias(value_col))
        .filter(F.col("__tag") == 1)
        .select("__k", "__ts", value_col)
    )
    # null-safe equality so NULL key/ts left rows survive (they map to
    # a NULL as-of value via the window's nulls-first ordering), same
    # as the pre-rejoin semantics; <=> is still a hash-joinable key
    return left.join(
        mapping,
        F.col(key_col).eqNullSafe(F.col("__k"))
        & F.col(left_ts_col).eqNullSafe(F.col("__ts")),
    ).select(*lcols, value_col)


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join each point (integer ts) to every interval with
    start <= ts <= end, via bucket equi-join + exact filter. All three
    ts columns must be integers in the same unit (e.g. epoch
    micros)."""
    p = points.withColumn("__b", F.expr(f"{point_ts_col} div {bucket_width}"))
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_width}"),
                F.expr(f"{end_col} div {bucket_width}"),
            )
        ),
    )
    return (
        p.join(i, "__b")
        .filter(
            (F.col(point_ts_col) >= F.col(start_col))
            & (F.col(point_ts_col) <= F.col(end_col))
        )
        .drop("__b")
    )


def cusum_drift(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    value_col: str,
    k: int,
    h: int,
) -> DataFrame:
    """One-sided CUSUM drift statistic (Page 1954) per key — the
    change-point detector for crawl health: has this host's fetch
    latency / error rate drifted upward past ``h``, allowing slack
    ``k`` per observation?

    The textbook recurrence ``s_t = max(0, s_{t-1} + (x_t - k))`` is
    sequential, but it has the exact closed form
    ``s_t = S_t - min(0, min_{j<=t} S_j)`` over the prefix sums
    ``S_t = sum_{i<=t} (x_i - k)`` — so the whole per-key scan runs as
    ONE window (running sum + running min in the same ordered frame),
    not an iterative fold or a Python UDF.  Integer-exact end to end.

    Scale shape: one shuffle on ``key_col``, one per-key ordered scan
    with O(1) frame state; rows within a key sort by (ts, order_col)
    so duplicate timestamps stay deterministic.  ``alarm`` marks every
    row at or past the threshold (monitoring variant — the statistic
    keeps running rather than resetting at the first alarm).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = events.withColumn("__d", F.col(value_col).cast("long") - F.lit(k))
    s = d.withColumn("__s", F.sum("__d").over(w)).withColumn(
        "__low", F.least(F.lit(0).cast("long"), F.min("__s").over(w))
    )
    return s.select(
        key_col,
        ts_col,
        order_col,
        F.col(value_col).cast("long").alias(value_col),
        (F.col("__s") - F.col("__low")).alias("stat"),
        ((F.col("__s") - F.col("__low")) >= h).alias("alarm"),
    )
