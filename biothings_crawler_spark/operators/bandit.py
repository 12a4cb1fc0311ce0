"""UCB1 bandit allocation for recrawl budgets (Auer, Cesa-Bianchi &
Fischer 2002, "Finite-time Analysis of the Multiarmed Bandit Problem"
— public literature), integer-exact so the DuckDB oracle replays it
bit-for-bit.

Crawler reading: every arm is a host (or URL class), a pull is a
refetch, the reward is "the page had changed" — the classic
explore/exploit tension of recrawl scheduling (complements the
Cho & Garcia-Molina frequency model in operators/recrawl.py: that one
estimates change RATE from history, this one allocates a FIXED budget
when history is thin and exploration still matters).

Determinism: UCB1's ``sqrt(2 ln N / n)`` bonus is transcendental, so
this operator uses the log2 variant — ``sqrt(2 log2(N) / n)`` — which
preserves the log-order exploration schedule while staying exactly
computable:

* ``floor(log2 N)`` = ``length(bin(N)) - 1`` (binary-string length;
  both engines have ``bin`` for BIGINT);
* the bonus in ppm is ``isqrt(2 * log2N * 10^12 / n)`` where isqrt is
  an EXACT integer square root: truncate the double sqrt, then correct
  by +-1 with integer comparisons.  The argument is <= 1.28e14 < 2^52,
  so the double is within one ulp and single-step correction is exact.

Scale shape: one hash aggregation keyed on arm (map-side combinable),
a 1-row global-pulls aggregate broadcast back, a row-local score
projection, then TakeOrdered for the top-``budget`` arms — no global
sort, no window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ISQRT = (
    "CASE WHEN (_s0 + 1) * (_s0 + 1) <= _x THEN _s0 + 1 "
    "WHEN _s0 * _s0 > _x THEN _s0 - 1 ELSE _s0 END"
)


def ucb_recrawl(
    trials: DataFrame,
    arm_col: str,
    reward_col: str,
    budget: int = 20,
) -> DataFrame:
    """Top-``budget`` arms by UCB1-log2 score over raw trial rows.

    ``reward_col`` must be boolean (did the pull pay off).  Returns
    (arm, pulls, wins, mean_ppm, bonus_ppm, score_ppm), the next
    round's recrawl allocation, ties broken by arm id.
    """
    per = (
        trials.select(
            F.col(arm_col).cast("long").alias("arm"),
            F.col(reward_col).cast("long").alias("_r"),
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("pulls"),
            F.sum("_r").cast("long").alias("wins"),
        )
    )
    glob = per.agg(F.sum("pulls").cast("long").alias("_n_total"))
    scored = (
        per.crossJoin(F.broadcast(glob))
        .withColumn(
            "_log2n",
            (F.length(F.expr("bin(_n_total)")) - 1).cast("long"),
        )
        .withColumn("mean_ppm", F.expr("(wins * 1000000L) div pulls"))
        .withColumn("_x", F.expr("(2L * _log2n * 1000000000000L) div pulls"))
        .withColumn(
            "_s0", F.expr("cast(sqrt(cast(_x as double)) as bigint)")
        )
        .withColumn("bonus_ppm", F.expr(_ISQRT))
        .withColumn("score_ppm", F.col("mean_ppm") + F.col("bonus_ppm"))
    )
    return (
        scored.select("arm", "pulls", "wins",
                      "mean_ppm", "bonus_ppm", "score_ppm")
        .orderBy(F.desc("score_ppm"), "arm")
        .limit(budget)
    )
