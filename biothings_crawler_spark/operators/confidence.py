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
    alert no matter how bad they look.

    The scaled variance ``floor(bad*(n-bad)*10^12 / n)`` is computed
    divide-first in two 10^6 stages (quotient/remainder each stage) so
    the intermediate never multiplies ``bad*(n-bad)`` by 10^12 —
    exact for any per-key ``n`` up to 3*10^7 (the scaled value itself
    outgrows int64 beyond that; earlier revisions overflowed past
    n ~ 6,000 with mid-range rates)."""
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
        per.withColumn("_p", F.expr("bad * (n - bad)"))
        .withColumn(
            "_t1",
            F.expr("(_p div n) * 1000000 + ((_p % n) * 1000000) div n"),
        )
        .withColumn("_r2", F.expr("((_p % n) * 1000000) % n"))
        .withColumn(
            "_x",
            F.expr("_t1 * 1000000 + (_r2 * 1000000) div n "
                   "+ 1000000000000"),
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


def ks_drift_binned(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    drift_ppm: int = 100_000,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift between rounds, computed on
    the engine's bounded log2-bin histogram plane (the same 64-bin
    representation as the latency-quantile operator): D = max over
    bins of |CDF_old - CDF_new| in exact ppm. Binning makes the
    statistic a LOWER bound on the true KS D (coarsening can only
    shrink a sup-distance), so a drift flag is never a binning
    artifact — and the heavy side of the computation is two hash aggs;
    the only window runs over <= 64 histogram rows.

    Returns ONE row ``(n_old, n_new, d_ppm, at_bin, drifted)`` —
    ``at_bin`` the smallest bin where the max gap is attained."""
    def hist(df, side):
        return (
            df.select(
                F.expr(f"length(bin(greatest(CAST({value_col} AS BIGINT), "
                       "0L) + 1)) - 1").alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias(side))
        )

    from pyspark.sql import Window

    merged = hist(old, "c_old").join(hist(new, "c_new"), "bin", "full").select(
        "bin",
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bin",
        F.sum("c_old").over(w).cast("long").alias("cum_old"),
        F.sum("c_new").over(w).cast("long").alias("cum_new"),
    )
    tot = merged.agg(
        F.sum("c_old").cast("long").alias("n_old"),
        F.sum("c_new").cast("long").alias("n_new"),
    )
    gaps = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "bin", "n_old", "n_new",
        "abs(cum_old * 1000000 div n_old - cum_new * 1000000 div n_new) "
        "AS gap_ppm",
    )
    # argmax as a min-struct (largest gap, then smallest bin) — no
    # window needed over the gap rows
    return (
        gaps.groupBy("n_old", "n_new")
        .agg(
            F.min(
                F.struct(
                    (-F.col("gap_ppm")).alias("ng"),
                    F.col("bin").alias("b"),
                )
            ).alias("_m")
        )
        .select(
            "n_old", "n_new",
            (-F.col("_m.ng")).cast("long").alias("d_ppm"),
            F.col("_m.b").cast("long").alias("at_bin"),
        )
        .withColumn("drifted", F.col("d_ppm") > F.lit(int(drift_ppm)))
    )


def cohen_kappa(
    labels: DataFrame,
    group_col: str = "grp",
    a_col: str = "label_a",
    b_col: str = "label_b",
) -> DataFrame:
    """Chance-corrected inter-annotator agreement per group (Cohen
    1960) — the label-QA gate for classifier training sets: raw
    agreement flatters annotators whenever one class dominates, so
    acceptance thresholds ("kappa >= 0.6") must correct for the
    agreement two annotators would reach by marginal chance alone.

    Integer-exact:  with n items, ``agree`` exact matches and
    ``pe_num = Σ_k row_k · col_k`` (marginal products over shared
    categories),

        kappa_ppm = (agree·n − pe_num) · 10⁶ div (n² − pe_num)

    — one floor division, replayed verbatim by the oracle.  Degenerate
    groups where chance agreement is total (n² == pe_num: both
    annotators constant) emit NULL.

    Scale shape: one hash agg to (group, a, b) confusion cells, two
    marginal aggs over those CELLS (bounded by category-pair count,
    not items), one (group, label)-keyed join of the marginals, one
    final agg.  Category cardinality bounds every post-cell structure,
    so a 10^10-item labeling audit reduces to cells after the first
    map-side-combined pass.
    """
    cells = labels.groupBy(
        F.col(group_col).alias("grp"),
        F.col(a_col).alias("a"),
        F.col(b_col).alias("b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    totals = cells.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("cnt"))
              .otherwise(F.lit(0))).cast("long").alias("agree"),
    )
    rows_ = cells.groupBy("grp", F.col("a").alias("k")).agg(
        F.sum("cnt").cast("long").alias("row_k"))
    cols_ = cells.groupBy("grp", F.col("b").alias("k")).agg(
        F.sum("cnt").cast("long").alias("col_k"))
    pe = rows_.join(cols_, ["grp", "k"]).groupBy("grp").agg(
        F.sum(F.col("row_k") * F.col("col_k")).cast("long").alias("pe_num"))
    out = totals.join(pe, "grp")
    return out.select(
        F.col("grp").alias("group"), "n", "agree", "pe_num",
        F.when(
            F.col("n") * F.col("n") != F.col("pe_num"),
            F.expr("(agree * n - pe_num) * 1000000"
                   " div (n * n - pe_num)"),
        ).cast("long").alias("kappa_ppm"),
    )
