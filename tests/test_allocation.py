"""Water-filling allocation: exact match to a pure-Python max-min
reference, the budget-conservation identity, and the fairness
property (a capped host never trails another allocation by more than
the one leftover slot)."""

import random

from biothings_crawler_spark.operators.allocation import (
    global_prefix_sum,
    waterfill_allocate,
)


def _ref_waterfill(demands, budget):
    items = sorted(demands.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    pref = 0
    k_star, pref_star, d_star = 0, 0, 0
    run = 0
    for k, (_h, d) in enumerate(items, start=1):
        run += d
        if run + (n - k) * d <= budget:
            k_star, pref_star, d_star = k, run, d
    if k_star == n:
        t, leftover = d_star, 0
    else:
        t = d_star + (budget - pref_star - (n - k_star) * d_star) // (
            n - k_star)
        leftover = budget - pref_star - (n - k_star) * t
    out = {}
    for k, (h, d) in enumerate(items, start=1):
        if d <= t:
            out[h] = d
        else:
            out[h] = t + (1 if k_star < k <= k_star + leftover else 0)
    return out


def test_waterfill_matches_reference_and_conserves(spark):
    rng = random.Random(17)
    for trial in range(3):
        demands = {f"host{i:03d}": rng.randrange(1, 200)
                   for i in range(60)}
        total = sum(demands.values())
        for budget in (total // 3, total - 1, total + 50, 59, 60):
            ref = _ref_waterfill(demands, budget)
            assert sum(ref.values()) == min(budget, total), budget
            df = spark.createDataFrame(
                list(demands.items()), "host string, demand long")
            got = {r["host"]: r["alloc"] for r in waterfill_allocate(
                df, "host", "demand", budget).collect()}
            assert got == ref, (trial, budget)
            # fairness: a capped host trails no allocation by > 1
            capped_min = min((a for h, a in got.items()
                              if a < demands[h]), default=None)
            if capped_min is not None:
                assert capped_min >= max(got.values()) - 1


def test_global_prefix_sum_is_a_scan(spark):
    rng = random.Random(2)
    rows = [(f"k{i:04d}", rng.randrange(1, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["k"]: (r["rank"], r["prefix"]) for r in global_prefix_sum(
        df, ["v", "k"], "v", n_partitions=8).collect()}
    run = 0
    for rank, (k, v) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])),
                                  start=1):
        run += v
        assert got[k] == (rank, run), k
