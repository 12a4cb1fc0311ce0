"""Crawl-trap detection and hot-host skew reporting.

Production crawl hygiene the reference handles implicitly (a human
watches Scrapy's per-spider page counts and kills runaway spiders;
the politeness budget in settings caps per-host damage — reference
``crawler/settings.py`` CONCURRENT_REQUESTS_PER_DOMAIN): at a
10^10-URL frontier nobody watches dashboards per host, so the engine
needs both as first-class batch operators over the frontier table.

* :func:`detect_traps` — calendar/faceted-search/session-id "spider
  traps" generate unboundedly many URLs from a handful of *URL
  patterns* (path templates).  Flag hosts whose distinct-URL count is
  large yet collapses onto few patterns once digit runs are
  normalized away.  Shape: ONE hash aggregation keyed by host with
  two count-distincts (Spark plans an Expand + two-phase partial
  aggregate — map-side reduction before the single shuffle), then a
  row-local ratio.  No windows, no joins; survives 10^10 rows.

* :func:`host_skew_report` — the politeness/scheduling plane shuffles
  by host; one hot host (a mega-site) skews that shuffle.  Report the
  top-k hosts by frontier share plus the integer salt factor that
  would split each hot host into ~``target_per_task``-URL tasks —
  directly consumable by the two-phase salted politeness window
  (operators/politeness.py).  Shape: per-host hash agg, a 1-row
  global-totals broadcast join (same pattern as bm25.py's totals),
  TakeOrderedAndProject for the top-k.  All integer arithmetic
  (ppm shares, ceil-division salt) so the DuckDB oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def url_pattern_col(url: Column) -> Column:
    """Collapse a URL onto its *pattern*: drop the query string &
    fragment, then normalize every digit run in the path to ``{N}``.

    ``https://h.example.org/item/8841?sid=3`` and
    ``https://h.example.org/item/17`` share pattern
    ``https://h.example.org/item/{N}``.  Both regexes are RE2-safe so
    the DuckDB oracle runs the identical pipeline.
    """
    no_q = F.regexp_replace(url, r"[?#].*$", "")
    return F.regexp_replace(no_q, r"[0-9]+", "{N}")


def detect_traps(
    frontier: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    min_urls: int = 100,
    min_urls_per_pattern_ppm: int = 50_000_000,
) -> DataFrame:
    """Per-host trap report: ``(host, n_urls, n_patterns,
    urls_per_pattern_ppm, is_trap)``.

    ``urls_per_pattern_ppm`` = distinct URLs per distinct pattern in
    parts-per-million (exact integer division — cross-engine stable).
    A host is a trap when it has at least ``min_urls`` distinct URLs
    AND the ratio clears ``min_urls_per_pattern_ppm`` (default 50
    URLs/pattern).  Both knobs deliberately conservative: a trap host
    at crawl scale shows ratios in the thousands.
    """
    pat = url_pattern_col(F.col(url_col))
    agg = (
        frontier.select(F.col(host_col).alias("host"), F.col(url_col).alias("url"),
                        pat.alias("pattern"))
        .groupBy("host")
        .agg(
            F.countDistinct("url").alias("n_urls"),
            F.countDistinct("pattern").alias("n_patterns"),
        )
    )
    ratio = F.expr("n_urls * 1000000 div n_patterns")
    return agg.select(
        "host", "n_urls", "n_patterns",
        ratio.alias("urls_per_pattern_ppm"),
        ((F.col("n_urls") >= F.lit(min_urls))
         & (ratio >= F.lit(min_urls_per_pattern_ppm))).alias("is_trap"),
    )


def host_skew_report(
    frontier: DataFrame,
    host_col: str = "host",
    top_k: int = 20,
    target_per_task: int = 10_000,
) -> DataFrame:
    """Top-``top_k`` hottest hosts with exact-integer skew metrics:
    ``(host, n_urls, share_ppm, skew_x_ppm, salt)``.

    * ``share_ppm``  — host's share of the frontier, ppm.
    * ``skew_x_ppm`` — host count vs the mean host count, ppm
      (1_000_000 = perfectly balanced).  The scheduler salts any host
      whose skew clears its comfort factor.
    * ``salt``       — ``ceil(n_urls / target_per_task)``: the salt
      modulus that caps each politeness-window task at roughly
      ``target_per_task`` URLs (operators/politeness.py consumes it).

    Deterministic order: count desc, host asc (stable top-k).
    """
    counts = frontier.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    totals = counts.agg(
        F.sum("n_urls").alias("total_urls"),
        F.count(F.lit(1)).alias("n_hosts"),
    )
    t = target_per_task
    return (
        counts.join(F.broadcast(totals))
        .select(
            "host", "n_urls",
            F.expr("n_urls * 1000000 div total_urls").alias("share_ppm"),
            F.expr("n_urls * n_hosts * 1000000 div total_urls").alias("skew_x_ppm"),
            F.expr(f"(n_urls + {t} - 1) div {t}").alias("salt"),
        )
        .orderBy(F.col("n_urls").desc(), "host")
        .limit(top_k)
    )
