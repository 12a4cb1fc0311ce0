"""Max-min fair (water-filling) crawl-budget allocation.

Each round the scheduler has a global fetch budget B and per-host
demands; proportional splits starve small hosts and flat quotas waste
budget on hosts that don't need theirs.  Max-min fairness gives every
host ``min(demand, t)`` for the unique water level t that spends the
budget, the classic link-bandwidth allocation (Bertsekas & Gallager,
"Data Networks", §6.5.2) applied to fetch slots.  Deterministic
integer contract: t is the largest integer level whose cost fits, and
the R leftover slots go to the R first capped hosts in (demand, host)
order — every engine computes the identical allocation.

The threshold needs a GLOBAL sorted prefix sum — the scale-relevant
part.  A naive ``Window.orderBy(...)`` with no partition key collapses
to one task; :func:`global_prefix_sum` does it the distributed way:
range-repartition on the sort key, per-partition window (parallel),
then a tiny per-partition totals table (n_partitions rows) collected
and broadcast back as cumulative offsets — the standard two-pass scan
primitive, O(rows/partitions) per task with one driver round-trip of
n_partitions rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    n_partitions: int = 32,
) -> DataFrame:
    """Append ``rank`` (1-based position in the global (order_cols)
    order) and ``prefix`` (inclusive running sum of ``value_col`` in
    that order) — distributed two-pass scan, never a single-task
    global window."""
    ranged = (df.repartitionByRange(n_partitions, *order_cols)
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint(eager=True))  # freeze sampled ranges
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = (ranged
             .withColumn("_lrank", F.row_number().over(w))
             .withColumn("_lsum", F.sum(value_col).over(w)))
    totals = (ranged.groupBy("_pid")
              .agg(F.count("*").alias("_cnt"),
                   F.sum(value_col).alias("_sum"))
              .orderBy("_pid").collect())
    off_rows, off_sums = {}, {}
    rows_acc = 0
    sum_acc = 0
    for r in totals:
        off_rows[r["_pid"]] = rows_acc
        off_sums[r["_pid"]] = sum_acc
        rows_acc += r["_cnt"]
        sum_acc += r["_sum"]
    rows_map = F.create_map(
        *[F.lit(x) for kv in off_rows.items() for x in kv])
    sums_map = F.create_map(
        *[F.lit(x) for kv in off_sums.items() for x in kv])
    return (local
            .withColumn("rank", (F.col("_lrank")
                                 + rows_map[F.col("_pid")]).cast("long"))
            .withColumn("prefix", (F.col("_lsum")
                                   + sums_map[F.col("_pid")]).cast("long"))
            .drop("_pid", "_lrank", "_lsum"))


def waterfill_allocate(
    df: DataFrame,
    host_col: str,
    demand_col: str,
    budget: int,
) -> DataFrame:
    """(host, demand) + global ``budget`` -> (host, demand, alloc):
    max-min fair integer allocation.  alloc = min(demand, t) with t the
    largest integer water level whose total cost <= budget, plus one
    extra slot for each of the R = leftover first capped hosts in
    (demand, host) order.  sum(alloc) == min(budget, sum(demand))."""
    base = df.select(F.col(host_col).alias("host"),
                     F.col(demand_col).cast("long").alias("demand"))
    pref = global_prefix_sum(base, ["demand", "host"], "demand")
    n_total = base.count()
    B = int(budget)

    # cost of setting t = this row's demand: everything at or below is
    # fully satisfied (prefix), everyone above gets this demand
    cost = F.col("prefix") + (F.lit(n_total) - F.col("rank")) * F.col("demand")
    feas = (pref.filter(cost <= B)
            .agg(F.max(F.struct("rank", "prefix", "demand")).alias("s"))
            .first()["s"])
    if feas is None:
        k_star, pref_star, d_star = 0, 0, 0
    else:
        k_star, pref_star, d_star = (feas["rank"], feas["prefix"],
                                     feas["demand"])
    if k_star == n_total:
        t = d_star
        leftover = 0
    else:
        t = d_star + (B - pref_star - (n_total - k_star) * d_star) // (
            n_total - k_star)
        leftover = B - pref_star - (n_total - k_star) * t
    alloc = (
        F.when(F.col("demand") <= t, F.col("demand"))
        .otherwise(F.lit(t)
                   + F.when((F.col("rank") > k_star)
                            & (F.col("rank") <= k_star + leftover),
                            F.lit(1)).otherwise(F.lit(0))))
    return pref.select(
        "host", "demand", alloc.cast("long").alias("alloc"))
