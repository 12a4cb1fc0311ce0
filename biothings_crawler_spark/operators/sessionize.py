"""Gap-based sessionization over the event stream — the batch twin of
Structured Streaming's session windows (the streaming side of this
engine handles cursors/watermarks in streaming/; this operator derives
sessions from the same events at rest).

All arithmetic is integer epoch-microseconds (timestampdiff from a
fixed NTZ epoch), so boundaries and aggregates are cross-engine exact —
no timestamp-format or float-second ambiguity.

Scale shape: the per-event work is ONE ``session_window`` aggregation —
Spark's built-in session assignment (sort within the key's partition,
then a streaming merge of adjacent-in-time events; map-side partial
session merge applies) — the same operator family as the streaming twin
(streaming/sessions.py). The per-key session NUMBERING is a second
HASH AGGREGATION (collect_list -> array_sort -> posexplode), NOT a
row_number window: sparse-activity keys make sessions ~ events (the
sf events table yields 3.94M sessions from 4M events), so a numbering
window would be a second full-size WindowExec pass — the exact shape
the pure-JVM control proves degrades >=2.15x under 4-way executor
concurrency on this host class. The agg's per-group memory is bounded
by one key's SESSION COUNT (bounded for real web keys — users/hosts
have bounded activity per retention window; a degenerate single-key
stream should be pre-split by time before calling). This replaced an
earlier lag+running-sum WindowExec composition over raw events:
identical output (pytest cross-checks the two shapes, session_idx
included), in the shapes that scale under concurrency (see
BENCH_SCALING_WEBTEXT.json / BASELINE.md).

Boundary semantics: this operator KEEPS an exactly-at-gap event in the
session (strict ``>`` on the gap) — and so does the built-in: Spark's
``session_window`` merges an event whose timestamp equals the previous
session's end (``ts + gap``), splitting only at gap strictly greater
than the duration (verified empirically at the 1-microsecond boundary
in tests/test_pipeline_ops.py::test_sessionize_gap_boundaries and the
window-composition cross-check). The two definitions coincide with the
gap passed through unchanged.

Skew: the hottest key's event count bounds one sort run; web-crawl keys
(user/host) are bounded per day in practice, and a pathological key can
be pre-split by day before calling (sessions never span the split when
the gap exceeds it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    time order and timestamps as epoch-microsecond BIGINTs.

    ``order_tiebreak_col`` is accepted for API stability but session
    membership is tiebreak-independent: equal timestamps have gap 0,
    which never exceeds a positive ``gap_seconds``, so ties always land
    in the same session regardless of intra-timestamp order.
    """
    gap_us = gap_seconds * 1_000_000
    # timestampdiff from a fixed NTZ epoch: timezone-free integer
    # microseconds (unix_micros rejects TIMESTAMP_NTZ, and a cast to
    # TIMESTAMP would re-interpret wall-clock in the session zone)
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    sessions = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.session_window(F.col(ts_col), f"{gap_us} microseconds"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
        )
    )
    # 1-based per-key numbering WITHOUT a window: collect the key's
    # sessions (disjoint intervals, unique start_us), sort, posexplode.
    # Hash-agg shape; per-group memory = one key's session count.
    numbered = (
        sessions.groupBy("key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("start_us", "end_us", "n_events"))
            ).alias("ss")
        )
        .select("key", F.posexplode("ss").alias("idx", "s"))
    )
    return numbered.select(
        "key",
        (F.col("idx") + 1).cast("long").alias("session_idx"),
        F.col("s.n_events").alias("n_events"),
        F.col("s.start_us").alias("start_us"),
        F.col("s.end_us").alias("end_us"),
        (F.col("s.end_us") - F.col("s.start_us")).alias("duration_us"),
    )


def sessionize_fold(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak_col: str,
    gap_seconds: int = 600,
) -> DataFrame:
    """Hash-agg-only twin of :func:`sessionize` — identical output
    (pytest cross-checks every column, session_idx included), computed
    without ANY SortExec or WindowExec in the physical plan.

    Why a second shape exists: ``session_window``'s physical operator
    sorts each key-partition by time, and partition-wide sorts are the
    one operator family measured to degrade >=2.15x under 4-way
    executor concurrency on this host class (pure-JVM control,
    BASELINE.md) — the lone N->4N scaling datapoint below 0.8.  This
    shape replaces the sort with per-key ARRAY expressions:

      groupBy(key) -> array_sort(collect_list(ts_us))       [hash agg]
      boundaries   = filter(indices, gap exceeded at i)     [row-local]
      sessions     = transform(boundaries, slice stats)     [row-local]
      posexplode                                            [row-local]

    ``array_sort`` is an expression over one key's own events —
    embarrassingly parallel, no shared sort buffers — so the whole
    plan is the same two-hash-agg shape as the chunked index build
    that holds 0.99 N->4N efficiency.  Per-group memory is one key's
    EVENT count (vs session count for :func:`sessionize`): bounded for
    real web keys (users/hosts have bounded activity per retention
    window); pre-split a degenerate single-key stream by time before
    calling, as with :func:`sessionize`.

    All boundary semantics match :func:`sessionize`: strict ``>`` on
    the gap, ties timestamp-equal events into one session,
    tiebreak-independent membership.
    """
    gap_us = gap_seconds * 1_000_000
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        F.array_sort(F.collect_list(us)).alias("evs")
    )
    # collect_list skips NULL timestamps (matching session_window's
    # NULL-row drop); a key with ONLY NULL timestamps leaves an empty
    # array — drop it entirely rather than emit a phantom session
    per = per.filter(F.size("evs") > 0)
    n = F.size("evs")
    # 0-based positions where a new session starts: position 0, and any
    # i whose gap from i-1 strictly exceeds gap_us.  greatest(i,1)
    # keeps element_at's 1-based index legal at i=0 (that branch of the
    # OR is then decided by i==0 regardless of the gap value).
    per = per.withColumn(
        "starts",
        F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda i: (i == 0)
            | (
                F.element_at("evs", (i + 1).cast("int"))
                - F.element_at(
                    "evs", F.greatest(i, F.lit(1)).cast("int"))
                > F.lit(gap_us)
            ),
        ),
    )

    # session j spans positions [starts[j], starts[j+1]-1] (last: n-1)
    def mk_session(s, j):
        nxt = F.when(
            j == F.size("starts") - 1, n
        ).otherwise(F.element_at("starts", (j + 2).cast("int")))
        return F.struct(
            (nxt - s).cast("long").alias("n_events"),
            F.element_at("evs", (s + 1).cast("int")).alias("start_us"),
            F.element_at("evs", nxt.cast("int")).alias("end_us"),
        )

    folded = per.select(
        "key",
        F.posexplode(F.transform("starts", mk_session)).alias("idx", "s"),
    )
    return folded.select(
        "key",
        (F.col("idx") + 1).cast("long").alias("session_idx"),
        F.col("s.n_events").alias("n_events"),
        F.col("s.start_us").alias("start_us"),
        F.col("s.end_us").alias("end_us"),
        (F.col("s.end_us") - F.col("s.start_us")).alias("duration_us"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
    max_gap_s: int = 1800,
) -> DataFrame:
    """First-order Markov transition census over per-user event
    streams — the navigation model behind next-action suggestion,
    funnel-dropoff dashboards, and crawl-trap detection on click
    paths (a state whose top transition loops back to itself with
    ~1.0 probability is the behavioral twin of a URL trap).

    Consecutive events of a user form a transition unless the gap
    exceeds ``max_gap_s`` (the sessionize boundary, so transitions
    never span sessions). Census per (src, dst): count, share of the
    source's outgoing transitions as exact ppm, and the source-local
    rank (1 = the suggestion).

    Shape: one per-user LEAD window (user-keyed partitions — the same
    distribution sessionize uses; no global window), one hash agg to
    state pairs, then a window over the STATE-PAIR census (bounded by
    |states|^2, not event count).

    Output: (src, dst, n, share_ppm, rank).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # gaps in integer MICROSECONDS: sub-second timestamps would make a
    # seconds cast truncate on one engine and keep fractions on the
    # other, flipping boundary transitions
    us = F.unix_micros(F.col(ts_col).cast('timestamp'))
    stepped = events.select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("dst"),
        (F.lead(us).over(w) - us).alias("_gap"),
    ).filter(F.col("dst").isNotNull()
             & (F.col("_gap") <= max_gap_s * 1_000_000))
    from biothings_crawler_spark.operators.profile import (
        census_share_rank,
    )

    census = stepped.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    return census_share_rank(census, ["src"], "n", ["dst"]).select(
        "src", "dst", "n", "share_ppm", "rank")
