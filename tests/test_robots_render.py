"""robots.txt rendering (operators/robots.render_robots_txt) and the
parse/render round-trip."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.robots import (
    parse_robots_txt,
    render_robots_txt,
)

_SCHEMA = ("host string, allow array<string>, disallow array<string>, "
           "crawl_delay long, sitemap_urls array<string>")


def test_canonical_rendering(spark):
    pol = spark.createDataFrame([
        ("h1", ["/pub/"], ["/priv/"], 5, ["https://h1/sm.xml"]),
        ("h2", [], [], None, []),
    ], _SCHEMA)
    got = {r.host: r.robots_txt
           for r in render_robots_txt(pol).collect()}
    assert got["h1"] == ("User-agent: *\nAllow: /pub/\nDisallow: /priv/"
                         "\nCrawl-delay: 5\nSitemap: https://h1/sm.xml")
    assert got["h2"] == "User-agent: *"


def test_roundtrip_through_real_parser(spark):
    """parse(render(policy)) == policy for every lane combination —
    both directions proven faithful in one property."""
    rows = []
    for i in range(16):
        rows.append((
            f"h{i}",
            ["/a/", "/b/"] if i % 2 else [],
            ["/x/"] if i % 3 else ["/y/", "/z/"],
            (i % 7) + 1 if i % 4 == 0 else None,
            [f"https://h{i}/s.xml"] if i % 5 == 0 else [],
        ))
    pol = spark.createDataFrame(rows, _SCHEMA)
    rendered = render_robots_txt(pol).select(
        "host", F.col("robots_txt").alias("body"))
    back = parse_robots_txt(rendered, agent="*")
    want = {r.host: (list(r.allow), list(r.disallow), r.crawl_delay,
                     list(r.sitemap_urls)) for r in pol.collect()}
    got = {r.host: (list(r.allow), list(r.disallow), r.crawl_delay,
                    list(r.sitemap_urls)) for r in back.collect()}
    assert got == want


def test_plan_pure_projection(spark):
    pol = spark.createDataFrame([("h", [], [], None, [])], _SCHEMA)
    plan = render_robots_txt(pol)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
