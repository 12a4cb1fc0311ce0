"""Sitemap-vs-crawl coverage audit (crawl-completeness observability).

The reference harvests most sources by walking their sitemaps
(crawler/spiders' sitemap scans; ``sources/sitemap.py`` here), which
makes "did the crawl actually cover what the site declared?" the
operator a crawl owner reads every round:

* **gaps** — URLs a sitemap declares that the crawl never fetched
  (scheduler starvation, robots denials, depth limits);
* **orphans** — URLs the crawl fetched that no sitemap declares
  (link-followed strays; also the classic signal a site's sitemap is
  stale or that the crawler wandered into a trap space).

Scale shape: one url-co-keyed full-outer join between the two slim
(host, url) projections — bucketable on the url key both tables
share — then ONE host-keyed hash aggregate with map-side partials.
Counts are exact integers; ratios are exact integer ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sitemap_coverage(
    declared: DataFrame,
    crawled: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Per-host coverage census over distinct declared/crawled URLs.

    Returns ``(host, n_declared, n_crawled, n_both, n_gaps,
    n_orphans, coverage_ppm, orphan_ppm)`` — ``coverage_ppm`` =
    fetched share of the declared set, ``orphan_ppm`` = undeclared
    share of the fetched set (0 when the denominator is empty:
    a host with no sitemap is reported, not divided by zero).
    """
    key = [host_col, url_col]
    d = declared.select(*key).distinct().withColumn("dd", F.lit(1))
    c = crawled.select(*key).distinct().withColumn("cc", F.lit(1))
    j = d.join(c, key, "full_outer").select(
        F.col(host_col).alias("host"),
        F.coalesce("dd", F.lit(0)).alias("dd"),
        F.coalesce("cc", F.lit(0)).alias("cc"),
    )
    agg = j.groupBy("host").agg(
        F.sum("dd").cast("long").alias("n_declared"),
        F.sum("cc").cast("long").alias("n_crawled"),
        F.sum(F.col("dd") * F.col("cc")).cast("long").alias("n_both"),
        F.sum(F.col("dd") * (1 - F.col("cc"))).cast("long").alias("n_gaps"),
        F.sum((1 - F.col("dd")) * F.col("cc")).cast("long")
        .alias("n_orphans"),
    )
    return agg.select(
        "host", "n_declared", "n_crawled", "n_both", "n_gaps", "n_orphans",
        F.expr(
            "CASE WHEN n_declared > 0"
            " THEN n_both * 1000000 div n_declared ELSE 0 END"
        ).alias("coverage_ppm"),
        F.expr(
            "CASE WHEN n_crawled > 0"
            " THEN n_orphans * 1000000 div n_crawled ELSE 0 END"
        ).alias("orphan_ppm"),
    )
