"""EXACT distributed quantiles over an integer column by iterative
histogram range-narrowing (distributed selection: the classic
multi-pass refinement of Blum et al.'s selection problem for
shared-nothing engines — see also Munro & Paterson 1980 on selection
with limited memory).

Why not a sketch: approx_percentile / KLL / t-digest give ~1% error
with one pass — fine for dashboards, useless for SLO gates ("p99
politeness delay must be EXACTLY <= budget") and impossible to verify
against an oracle bit-for-bit.  Exact sorting is a full shuffle of the
column — dead at 100 TB.  Range-narrowing gets exactness in O(log_B
range) passes, each pass a single hash aggregation with AT MOST ``B``
groups (bounded reducer state, map-side partials do almost all the
work), no sort, no shuffle of raw rows:

1. one agg for global (min, max, count); target rank k = ceil(q * n);
2. per pass: bucket the active range into <= B equal-width bins, count
   rows per bin (ONE groupBy whose key has <= B values), walk the <= B
   counts on the driver to find the bin containing rank k, recurse
   into it with the rank rebased;
3. stop when the active range collapses to one value (or its width
   <= B, where the same per-value count walk reads the answer
   directly).

A 64-bit domain converges in <= ceil(64 / log2(B)) ~ 7 passes with
B = 1024 — independent of row count, so the pass count is the same at
10^6 and 10^13 rows.  Multiple quantiles share passes while their
active ranges coincide (they always do on pass 1); the driver-side
state is <= B counted bins per distinct range — scalar reads, the
sanctioned cursor pattern, never a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    q_ppms: list[int],
    bins: int = 1024,
) -> DataFrame:
    """Exact q-quantiles (q in ppm) of a long column.

    Contract: rank = clamp(ceil(q_ppm * n / 10^6), 1, n), value = the
    rank-th smallest (ties collapse naturally: the answer is a value,
    found by counted bins, never by ordering equal elements).

    Returns a SMALL driver-built DataFrame (q_ppm, n, rank, value) —
    the computation is distributed; only <= B bin counts per pass ever
    reach the driver.
    """
    vals = df.select(F.col(col).cast("long").alias("x")) \
             .filter(F.col("x").isNotNull())
    head = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("lo"), F.max("x").alias("hi")).collect()[0]
    n = head["n"]
    spark = df.sparkSession
    schema = "q_ppm long, n long, rank long, value long"
    if n == 0:
        return spark.createDataFrame([], schema)

    # state per quantile: (lo, hi, k) with k the 1-based rank among
    # rows in [lo, hi]
    state = {}
    for q in q_ppms:
        k = (q * n + 999_999) // 1_000_000
        state[q] = (head["lo"], head["hi"], max(1, min(n, k)))

    done: dict[int, int] = {}
    while len(done) < len(state):
        # group unresolved quantiles by their active range: one
        # aggregation job per DISTINCT range (all share pass 1)
        by_range: dict[tuple[int, int], list[int]] = {}
        for q, (lo, hi, _k) in state.items():
            if q in done:
                continue
            if lo == hi:
                done[q] = lo
                continue
            by_range.setdefault((lo, hi), []).append(q)
        for (lo, hi), qs in by_range.items():
            width = hi - lo + 1
            if width <= bins:
                # endgame: exact per-value counts inside the sliver
                counts = (
                    vals.filter((F.col("x") >= lo) & (F.col("x") <= hi))
                    .groupBy("x").agg(F.count(F.lit(1)).alias("c"))
                    .collect())
                hist = sorted((r["x"], r["c"]) for r in counts)
                for q in qs:
                    k = state[q][2]
                    run = 0
                    for v, c in hist:
                        run += c
                        if run >= k:
                            done[q] = v
                            break
            else:
                step = -(-width // bins)  # ceil: <= bins buckets
                counts = (
                    vals.filter((F.col("x") >= lo) & (F.col("x") <= hi))
                    .groupBy(F.expr(f"(x - {lo}L) div {step}L")
                             .alias("b"))
                    .agg(F.count(F.lit(1)).alias("c"))
                    .collect())
                hist = sorted((r["b"], r["c"]) for r in counts)
                for q in qs:
                    k = state[q][2]
                    run = 0
                    for b, c in hist:
                        if run + c >= k:
                            state[q] = (
                                lo + b * step,
                                min(hi, lo + (b + 1) * step - 1),
                                k - run,
                            )
                            break
                        run += c

    rows = []
    for q in q_ppms:
        k = (q * n + 999_999) // 1_000_000
        rows.append((q, n, max(1, min(n, k)), done[q]))
    return spark.createDataFrame(rows, schema)
