"""Sitemap rendering (sources/sitemap.render_sitemaps): protocol cap,
bounded two-level rank, XML escaping, index documents."""

import re

from biothings_crawler_spark.sources.sitemap import render_sitemaps


def _rows(spark, pages, **kw):
    df = spark.createDataFrame(pages, "host string, url string, lastmod string")
    return render_sitemaps(df, **kw).collect()


def test_cap_splits_parts_and_index_lists_them(spark):
    pages = [("h", f"https://h/p/{i:03d}", "2025-01-01") for i in range(25)]
    out = _rows(spark, pages, cap=10, n_buckets=4)
    parts = sorted(r.part for r in out if r.kind == "sitemap")
    assert parts == [0, 1, 2]
    sizes = {r.part: r.n_urls for r in out if r.kind == "sitemap"}
    assert sizes[0] == 10 and sizes[1] == 10 and sizes[2] == 5
    idx = [r for r in out if r.kind == "index"]
    assert len(idx) == 1 and idx[0].part == -1
    assert idx[0].xml.count("<sitemap>") == 3
    assert "/sitemap-0.xml" in idx[0].xml and "/sitemap-2.xml" in idx[0].xml


def test_single_part_host_gets_no_index(spark):
    out = _rows(spark, [("h", "https://h/a", "2025-01-01")],
                cap=10, n_buckets=4)
    assert [r.kind for r in out] == ["sitemap"]


def test_every_url_lands_exactly_once(spark):
    pages = [("h", f"https://h/p/{i}", "2025-01-01") for i in range(40)] + \
            [("g", f"https://g/p/{i}", "2025-02-02") for i in range(7)]
    out = _rows(spark, pages, cap=6, n_buckets=4)
    locs = []
    for r in out:
        if r.kind == "sitemap":
            locs += re.findall(r"<loc>([^<]+)</loc>", r.xml)
            assert r.n_urls <= 6
    assert sorted(locs) == sorted(u for _, u, _ in pages)


def test_xml_entity_escaping(spark):
    out = _rows(spark, [("h", "https://h/p?a=1&b=<2>&c=\"q'", "2025-01-01")],
                cap=10, n_buckets=4)
    xml = out[0].xml
    assert "&amp;" in xml and "&lt;2&gt;" in xml
    assert "&quot;" in xml and "&apos;" in xml
    assert "&b=<" not in xml


def test_deterministic_across_partitionings(spark):
    pages = [("h", f"https://h/p/{i}", "2025-01-01") for i in range(30)]
    df1 = spark.createDataFrame(pages, "host string, url string, lastmod string")
    one = {(r.host, r.part, r.kind): r.xml
           for r in render_sitemaps(df1.repartition(1), cap=8).collect()}
    many = {(r.host, r.part, r.kind): r.xml
            for r in render_sitemaps(df1.repartition(16), cap=8).collect()}
    assert one == many


def test_sitemap_scope_audit_verdicts(spark):
    from biothings_crawler_spark.sources.sitemap import (
        sitemap_scope_audit,
        sitemap_scope_census,
    )

    entries = spark.createDataFrame(
        [
            ("https://a.com/sub/sitemap.xml", "https://a.com/sub/p1"),
            ("https://a.com/sub/sitemap.xml", "https://a.com/sub/x/p2"),
            ("https://a.com/sub/sitemap.xml", "https://a.com/other/p3"),
            ("https://a.com/sub/sitemap.xml", "https://b.com/sub/p4"),
            ("https://a.com/sub/sitemap.xml", "http://a.com/sub/p5"),
            # root sitemap scopes the whole host
            ("https://a.com/sitemap.xml", "https://a.com/other/p6"),
            # bare-origin homepage without trailing slash (review
            # finding: must be in_scope for the root sitemap)
            ("https://a.com/sitemap.xml", "https://a.com"),
        ],
        "sitemap_url string, url string",
    )
    rows = {r["url"]: r["verdict"]
            for r in sitemap_scope_audit(entries).collect()}
    assert rows == {
        "https://a.com/sub/p1": "in_scope",
        "https://a.com/sub/x/p2": "in_scope",
        "https://a.com/other/p3": "above_path",
        "https://b.com/sub/p4": "wrong_origin",
        "http://a.com/sub/p5": "wrong_origin",
        "https://a.com/other/p6": "in_scope",
        "https://a.com": "in_scope",
    }
    c = {r["sitemap_url"]: r for r in
         sitemap_scope_census(sitemap_scope_audit(entries)).collect()}
    sub = c["https://a.com/sub/sitemap.xml"]
    assert (sub["n_declared"], sub["n_ignored"]) == (5, 3)
    assert sub["ignored_ppm"] == 600_000
