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


def aimd_host_rates(
    fetches: DataFrame,
    host_col: str,
    ts_col: str,
    status_col: str,
    base_rate_rph: int = 60,
    min_rate_rph: int = 6,
    max_rate_rph: int = 3600,
    incr_rph: int = 12,
) -> DataFrame:
    """Per-host AIMD crawl-rate controller: fold the fetch log's
    backpressure signals (HTTP 429 / 5xx) into the next round's
    per-host request rate, TCP-congestion-control style — additive
    increase on a clean hour, multiplicative (halving) decrease on a
    backpressure hour.  The reference fixes politeness budgets per
    spider (CONCURRENT_REQUESTS_PER_DOMAIN-era settings); at
    10^10-frontier scale the host set is too large and too uneven to
    hand-tune, so the fetch log itself must drive the budgets that
    `politeness.select_politely` enforces.

    Scale shape: per-URL histories are bounded but per-HOST fetch logs
    are not (a hot host sees millions of rows), so the fold never sees
    raw fetches.  Stage 1 reduces (host, hour) -> any-backpressure
    flag in one hash aggregate (map-side partials absorb the hot-host
    skew); stage 2 folds the ordered HOURLY flags per host — bounded
    by the log's calendar span, not its row count.  All arithmetic is
    integer add/halve/clamp, so the fold is bit-identical in the
    DuckDB list_reduce twin.

    Output: (host, n_hours, n_fetches, n_backoff_hours, rate_rph) —
    requests-per-hour budget for the next crawl round.
    """
    hour_us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    ) - F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    ) % F.lit(3_600_000_000)
    backpressure = (
        (F.col(status_col) == 429) | (F.col(status_col) >= 500)
    ).cast("int")
    hourly = fetches.groupBy(
        F.col(host_col).alias("host"), hour_us.alias("hour_us")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.max(backpressure).alias("backoff"),
    )
    per_host = hourly.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("n_fetches").cast("long").alias("n_fetches"),
        F.sum("backoff").cast("long").alias("n_backoff_hours"),
        F.array_sort(F.collect_list(F.struct("hour_us", "backoff"))).alias("hist"),
    )
    fold = F.aggregate(
        F.col("hist"),
        F.lit(int(base_rate_rph)).cast("long"),
        lambda acc, s: F.when(
            s["backoff"] == 1,
            F.greatest(
                F.lit(int(min_rate_rph)).cast("long"),
                F.floor(acc / 2).cast("long"),
            ),
        ).otherwise(
            F.least(
                F.lit(int(max_rate_rph)).cast("long"),
                (acc + F.lit(int(incr_rph))).cast("long"),
            )
        ),
    )
    return per_host.select(
        "host", "n_hours", "n_fetches", "n_backoff_hours", fold.alias("rate_rph")
    )


def clamp_with_cache_policy(
    schedule: DataFrame, policies: DataFrame, url_col: str = "url",
) -> DataFrame:
    """Apply the server's freshness floor to the model-driven
    schedule: never refetch BEFORE the declared staleness horizon
    (``stale_at_us`` from operators/http.cache_ttl) — a fetch inside
    the freshness window is a guaranteed 304/unchanged, the waste the
    conditional-fetch report measures.  The floor only delays; the
    change model still decides how much LATER than staleness to
    revisit.

    Left join on url (unpoliced urls pass through), row-local
    ``greatest`` clamp plus a ``was_clamped`` flag for observability.
    Scale: the policy table shares the schedule's key — co-locate by
    bucketing on url, or broadcast when the policed subset is small.
    """
    pol = policies.select(
        F.col(url_col).alias("__pol_url"), F.col("stale_at_us"))
    j = schedule.join(
        pol, schedule[url_col] == F.col("__pol_url"), "left")
    clamped = F.greatest(
        F.col("next_due_us"),
        F.coalesce(F.col("stale_at_us"), F.lit(0).cast("long")),
    )
    return j.select(
        *[F.col(c) for c in schedule.columns if c != "next_due_us"],
        clamped.alias("next_due_us"),
        (F.coalesce(F.col("stale_at_us"), F.lit(0).cast("long"))
         > F.col("next_due_us")).alias("was_clamped"),
    )


def retry_backoff(
    fetches: DataFrame,
    base_s: int = 60,
    cap_s: int = 3600,
    max_attempts: int = 5,
) -> DataFrame:
    """Exponential-backoff retry scheduling over the fetch log — the
    failure-side complement of the Cho & Garcia-Molina refresh model
    above: a URL's TRAILING failure streak (failures since its last
    success, the whole history if it never succeeded) sets its next
    attempt at ``last_ts + min(base * 2^(streak-1), cap)``, and streaks
    past ``max_attempts`` leave the frontier entirely (``give_up``) so
    dead URLs stop consuming politeness budget.

    Input ``(url, ts_us, ok)``; output one row per url with
    ``(n_fails, last_ts_us, action ok|retry|give_up, next_due_us)``.
    Exact integers throughout (delay via shiftleft, no float pow).
    Shape: two url-keyed hash aggregates (the streak needs last_ok
    first) joined on their shared key — both sides arrive
    hash-partitioned on url, so the join adds no third exchange; no
    window."""
    agg = fetches.groupBy("url").agg(
        F.max("ts_us").alias("last_ts_us"),
        F.max(F.when(F.col("ok"), F.col("ts_us"))).alias("last_ok_us"),
    )
    fails = (
        fetches.join(
            agg.select("url", "last_ok_us"), "url"
        )
        .filter(
            F.col("last_ok_us").isNull()
            | (F.col("ts_us") > F.col("last_ok_us"))
        )
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n_fails"))
    )
    out = agg.join(fails, "url", "left").select(
        "url",
        F.coalesce("n_fails", F.lit(0)).cast("long").alias("n_fails"),
        F.col("last_ts_us").cast("long"),
    )
    # SQL shiftleft takes a column bit count; the Python F.shiftleft
    # binding is int-only (the F.locate trap's sibling)
    delay_s = F.expr(
        f"least(shiftleft({int(base_s)}, cast(n_fails - 1 as int)),"
        f" {int(cap_s)})"
    )
    return out.select(
        "url",
        "n_fails",
        "last_ts_us",
        F.when(F.col("n_fails") == 0, F.lit("ok"))
        .when(F.col("n_fails") >= max_attempts, F.lit("give_up"))
        .otherwise(F.lit("retry"))
        .alias("action"),
        F.when(
            (F.col("n_fails") > 0) & (F.col("n_fails") < max_attempts),
            F.col("last_ts_us") + delay_s * 1_000_000,
        ).cast("long").alias("next_due_us"),
    )
