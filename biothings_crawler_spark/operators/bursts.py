"""Term burst-interval detection over time-bucketed count series —
the temporal companion to text.trending_terms (which ranks drift
between two SNAPSHOTS): given (term, hour_no, n) observed-hour counts,
find the contiguous intervals where a term runs anomalously hot
(breaking news, scraper loops, spam campaigns hitting the frontier),
the signal a crawl scheduler uses to spin discovery budgets up and a
curation pipeline uses to quarantine event-correlated spam.

The detector is a deterministic hysteresis EWMA (the integer-exact
stand-in for Kleinberg's two-state burst automaton, which needs
transcendental likelihoods): a term ENTERS burst when its count
reaches ``enter_pct``% of the pre-spike EWMA baseline and EXITS when
it falls under ``exit_pct``% — two thresholds so borderline hours
don't flap. The baseline FREEZES while a burst runs (a long burst
must not raise its own baseline and mask itself) and resumes
absorbing on the exit observation. All arithmetic is integer
centi-units (the discovery_forecast EWMA recurrence), so the fold is
bit-identical in the DuckDB single-string-state twin.

Scale shape: one term-keyed hash agg collecting the bounded hourly
series (bounded by the calendar span, not row count — upstream is a
(term, hour) aggregate), then a row-local struct fold + one
posexplode of the detected intervals. No windows over the corpus; the
only window is per-term burst numbering over interval rows (a few per
term by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burst_intervals(
    counts: DataFrame,
    enter_pct: int = 200,
    exit_pct: int = 100,
    alpha_pct: int = 30,
) -> DataFrame:
    """Input ``(term, hour_no, n)``; returns one row per detected
    burst: ``(term, burst_no, start_hour, end_hour)``, intervals in
    observed-hour space (an interval closes at the last observed hour
    before the exit observation; a series still hot at its end closes
    at its final hour). The first observation only seeds the baseline
    — a term can never burst on its first hour."""
    a, ent, ext = int(alpha_pct), int(enter_pct), int(exit_pct)
    per = counts.groupBy("term").agg(
        F.array_sort(F.collect_list(F.struct("hour_no", "n"))).alias("hs")
    )

    def step(acc, s):
        n100 = s["n"].cast("long") * 100
        hour = s["hour_no"].cast("long")
        first = acc["ewma"] < 0
        enter = (~first) & (acc["inb"] == 0) & (n100 * 100 >= ent * acc["ewma"])
        exit_ = (acc["inb"] == 1) & (n100 * 100 < ext * acc["ewma"])
        # exact floor-division by 100: route through decimal(38,0) so the
        # fold stays bit-identical to the oracle's integer `// 100` even
        # past 2^53 (double `/` + floor diverges from the integer floor
        # there, breaking the advertised exact fold)
        upd = F.floor(
            (F.lit(a) * n100.cast("decimal(38,0)")
             + F.lit(100 - a) * acc["ewma"].cast("decimal(38,0)")) / 100
        )
        return F.struct(
            F.when(first, n100)
            .when(enter | ((acc["inb"] == 1) & ~exit_), acc["ewma"])
            .otherwise(upd).cast("long").alias("ewma"),
            F.when(enter, F.lit(1)).when(exit_, F.lit(0))
            .otherwise(acc["inb"]).cast("long").alias("inb"),
            F.when(enter, hour).otherwise(acc["start"]).alias("start"),
            hour.alias("last"),
            F.when(
                exit_,
                F.concat_ws(
                    ",", F.nullif(acc["iv"], F.lit("")),
                    F.concat_ws("-", acc["start"], acc["last"]),
                ),
            ).otherwise(acc["iv"]).alias("iv"),
        )

    def finish(acc):
        return F.when(
            acc["inb"] == 1,
            F.concat_ws(
                ",", F.nullif(acc["iv"], F.lit("")),
                F.concat_ws("-", acc["start"], acc["last"]),
            ),
        ).otherwise(acc["iv"])

    init = F.struct(
        F.lit(-1).cast("long").alias("ewma"),
        F.lit(0).cast("long").alias("inb"),
        F.lit(0).cast("long").alias("start"),
        F.lit(0).cast("long").alias("last"),
        F.lit("").alias("iv"),
    )
    folded = per.select(
        "term", F.aggregate("hs", init, step, finish).alias("iv")
    ).filter(F.col("iv") != "")
    iv = folded.select(
        "term", F.explode(F.split("iv", ",")).alias("span")
    ).select(
        "term",
        F.split("span", "-")[0].cast("long").alias("start_hour"),
        F.split("span", "-")[1].cast("long").alias("end_hour"),
    )
    w = Window.partitionBy("term").orderBy("start_hour")
    return iv.select(
        "term",
        F.row_number().over(w).cast("long").alias("burst_no"),
        "start_hour",
        "end_hour",
    )
