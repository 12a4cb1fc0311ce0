"""Sitemap XML parsing (sources/sitemap.parse_sitemap_xml)."""

from biothings_crawler_spark.sources.sitemap import parse_sitemap_xml

BODY = """<?xml version="1.0"?><urlset>
<url><loc> https://h/p1 </loc><lastmod>2024-03-05</lastmod>
<changefreq>Daily</changefreq><priority>0.8</priority></url>
<url><loc>https://h/p2</loc><priority>1</priority></url>
<url><loc>https://h/p3</loc><changefreq>never</changefreq>
<priority>0.05</priority></url>
<url><lastmod>2024-01-01</lastmod></url>
<url><loc>https://h/p4</loc><changefreq>weird</changefreq></url>
</urlset>"""


def _parse(spark):
    df = spark.createDataFrame(
        [("https://h/sitemap.xml", BODY)], "sitemap_url string, body string"
    )
    return {r.loc: r for r in parse_sitemap_xml(df).collect()}


def test_fields_and_integer_priority(spark):
    out = _parse(spark)
    p1 = out["https://h/p1"]  # whitespace-trimmed loc
    assert p1.lastmod == "2024-03-05"
    assert p1.changefreq == "daily" and p1.recrawl_hours == 24
    assert p1.priority_milli == 800
    assert out["https://h/p2"].priority_milli == 1000   # no dot
    assert out["https://h/p3"].priority_milli == 50     # 0.05
    assert out["https://h/p3"].recrawl_hours == 0       # never


def test_defaults_and_decoy_block(spark):
    out = _parse(spark)
    assert len(out) == 4  # loc-less block dropped
    p4 = out["https://h/p4"]
    assert p4.priority_milli == 500     # absent priority -> 0.5
    assert p4.recrawl_hours == 168      # unknown changefreq -> weekly


def test_plan_is_row_local(spark):
    df = spark.createDataFrame(
        [("s", BODY)], "sitemap_url string, body string"
    )
    plan = parse_sitemap_xml(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
