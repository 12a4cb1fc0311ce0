"""Adaptive recrawl scheduling — freshness-driven revisit intervals
over the fetch history, the batch form of the classic incremental-
crawler policy (Cho & Garcia-Molina, "Effective Page Refresh Policies
for Web Crawlers"): pages that change when revisited get their
interval halved, pages that don't get it doubled, clamped to
[min_interval, max_interval]. The reference crawls sources on fixed
schedules (its spiders are one-shot); at 10^10-frontier scale the
revisit policy IS the crawl budget, so this operator turns the fetch
log into the next crawl round's due list.

Spark-first shape: change flags are a lag window over (url, ts) — one
keyed exchange; the interval fold is a per-URL integer aggregate over
the ordered flag array (bounded by that URL's own fetch count — fetch
histories are short by construction, the operator's output feeds the
next round's frontier, not an unbounded log scan). All arithmetic is
integer doubling/halving, so the fold is bit-identical in the DuckDB
list_reduce twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    fetches: DataFrame,
    url_col: str,
    ts_col: str,
    hash_col: str,
    tiebreak_col: str,
    base_interval_s: int = 86400,
    min_interval_s: int = 3600,
    max_interval_s: int = 30 * 86400,
) -> DataFrame:
    """fetch history (url, fetch ts, content hash) -> one row per url:
    (url, n_fetches, n_changes, interval_s, next_due_us).

    The interval starts at ``base_interval_s`` and folds over the
    fetch-over-fetch change flags in time order (``tiebreak_col``
    breaks equal timestamps so the fold is deterministic in both
    engines): changed -> halve (clamp min), unchanged -> double
    (clamp max). ``next_due_us`` = last fetch time + interval, in
    epoch microseconds. The first fetch of a url carries no flag
    (nothing to compare against)."""
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )
    w = Window.partitionBy(url_col).orderBy(ts_col, tiebreak_col)
    flagged = fetches.select(
        F.col(url_col).alias("url"),
        us.alias("us"),
        F.col(tiebreak_col).alias("tb"),
        F.when(
            F.lag(hash_col).over(w).isNotNull(),
            (F.col(hash_col) != F.lag(hash_col).over(w)).cast("int"),
        ).alias("chg"),
    )
    per_url = flagged.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.sum(F.coalesce("chg", F.lit(0))).cast("long").alias("n_changes"),
        F.max("us").alias("last_us"),
        F.array_sort(
            F.collect_list(F.struct("us", "tb", "chg"))
        ).alias("hist"),
    )
    fold = F.aggregate(
        F.filter(F.col("hist"), lambda s: s["chg"].isNotNull()),
        F.lit(int(base_interval_s)).cast("long"),
        lambda acc, s: F.when(
            s["chg"] == 1,
            F.greatest(
                F.lit(int(min_interval_s)).cast("long"),
                F.floor(acc / 2).cast("long"),
            ),
        ).otherwise(
            F.least(
                F.lit(int(max_interval_s)).cast("long"),
                (acc * F.lit(2)).cast("long"),
            )
        ),
    )
    return per_url.select(
        "url",
        "n_fetches",
        "n_changes",
        fold.alias("interval_s"),
        (F.col("last_us") + fold * F.lit(1_000_000)).alias("next_due_us"),
    )
