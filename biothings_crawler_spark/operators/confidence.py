"""Wilson confidence bounds over per-host outcome rates — the
statistically honest blocklist/alert criterion: a host with 2 errors
out of 3 fetches must not outrank one with 200 of 1000, so hosts are
judged by the LOWER confidence bound of their error rate, not the raw
ratio (Wilson 1927 — the classic "how not to sort by average rating"
correction; Heritrix-class crawlers gate retry/quarantine decisions
the same way).

Exactness: with z = 2 (~95.4% two-sided) the Wilson bounds are
algebraic in (x successes?, n trials) plus one square root of a
rational; the root is the corrected-seed exact isqrt on the value
pre-scaled by 10^12, and every remaining step is integer ppm — the
oracle replays the identical floors:

    s       = isqrt( (x*(n-x)*10^12) div n + 10^12 )     # 10^6*sqrt
    lb_ppm  = max(0, (x+2)*10^6 - 2*s) div (n + 4)
    ub_ppm  = min(10^6, ((x+2)*10^6 + 2*s) div (n + 4))

Shape: one host-keyed hash agg, then a row-local projection over
|hosts| rows. No windows, no Python, no libm in the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wilson_flags(
    outcomes: DataFrame,
    key_col: str,
    bad_col: str,
    alert_ppm: int = 300_000,
) -> DataFrame:
    """``(key, n, bad, rate_ppm, lb_ppm, ub_ppm, flag)`` per key from
    boolean ``bad_col`` outcome rows: ``flag`` when even the LOWER
    bound of the bad-rate clears ``alert_ppm`` — small samples can't
    alert no matter how bad they look."""
    per = (
        outcomes.select(
            F.col(key_col).alias("key"),
            F.col(bad_col).cast("long").alias("_b"),
        )
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_b").cast("long").alias("bad"),
        )
    )
    staged = (
        per.withColumn(
            "_x", F.expr("(bad * (n - bad) * 1000000000000) div n "
                         "+ 1000000000000")
        )
        .withColumn(
            "_s0", F.expr("cast(sqrt(cast(_x as double)) as bigint)")
        )
        .withColumn(
            "_s",
            F.expr(
                "CASE WHEN (_s0 + 1) * (_s0 + 1) <= _x THEN _s0 + 1 "
                "WHEN _s0 * _s0 > _x THEN _s0 - 1 ELSE _s0 END"
            ).cast("long"),
        )
    )
    return staged.selectExpr(
        "key", "n", "bad",
        "bad * 1000000 div n AS rate_ppm",
        "greatest((bad + 2) * 1000000 - 2 * _s, 0L) div (n + 4) AS lb_ppm",
        "least(((bad + 2) * 1000000 + 2 * _s) div (n + 4), 1000000L) "
        "AS ub_ppm",
    ).withColumn("flag", F.col("lb_ppm") > F.lit(int(alert_ppm)))
