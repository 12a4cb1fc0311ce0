"""Parallel-corpus mining signals (operators/hreflang)."""

from biothings_crawler_spark.operators.hreflang import (
    hreflang_clusters,
    hreflang_links,
    url_align_pairs,
)


def _pages(spark):
    u = "https://site.example"

    def tags(*langs, q='"'):
        return "".join(
            f"<link rel={q}alternate{q} hreflang={q}{l}{q} "
            f"href={q}{u}/{l}/p/1{q}/>"
            for l in langs
        )

    return spark.createDataFrame(
        [
            # complete mutual group, double quotes
            (f"{u}/de/p/1", "de", f"<head>{tags('en', 'de', 'fr')}</head>"),
            (f"{u}/en/p/1", "en", f"<head>{tags('en', 'de', 'fr')}</head>"),
            # single-quote attribute style must parse too
            (f"{u}/fr/p/1", "fr",
             f"<head>{tags('en', 'de', 'fr', q=chr(39))}</head>"),
            # partial declarer: only points at en -> its own subcluster
            (f"{u}/it/p/1", "it", f"<head>{tags('en')}</head>"),
            # malformed tag (no href) and a silent page: both drop out
            (f"{u}/es/p/1", "es",
             '<head><link rel="alternate" hreflang="es"/></head>'),
            (f"{u}/pt/p/1", "pt", "<head>no links here</head>"),
        ],
        "url string, lang string, html string",
    )


def test_links_both_quote_styles_and_malformed_drop(spark):
    links = hreflang_links(_pages(spark)).collect()
    by_url = {}
    for r in links:
        by_url.setdefault(r.url, []).append((r.hreflang, r.href))
    assert len(by_url["https://site.example/de/p/1"]) == 3
    assert len(by_url["https://site.example/fr/p/1"]) == 3  # single-quote
    assert "https://site.example/es/p/1" not in by_url      # no href
    assert "https://site.example/pt/p/1" not in by_url      # no tags


def test_clusters_min_url_key_and_partial_degradation(spark):
    pages = _pages(spark)
    out = {
        r.url: (r.cluster_id, r.lang)
        for r in hreflang_clusters(hreflang_links(pages), pages).collect()
    }
    u = "https://site.example"
    # the mutual trio all collapse to the lexicographic min (the de url)
    for l in ("de", "en", "fr"):
        assert out[f"{u}/{l}/p/1"][0] == f"{u}/de/p/1"
    # partial declarer: min(self, en-href) = its own url (it < ... no:
    # en < it lexicographically), so it lands in the en-keyed subcluster
    assert out[f"{u}/it/p/1"][0] == f"{u}/en/p/1"
    # lang comes from the page row, not the tag
    assert out[f"{u}/fr/p/1"][1] == "fr"
    assert f"{u}/pt/p/1" not in out


def test_url_align_pairs_all_marker_styles(spark):
    frontier = spark.createDataFrame(
        [
            # path style
            ("https://www.s.example/en/docs/7",),
            ("https://www.s.example/de/docs/7",),
            # query-param style
            ("https://s.example/page?id=7&lang=en",),
            ("https://s.example/page?id=7&lang=fr",),
            # subdomain style
            ("https://en.s.example/docs/9",),
            ("https://ru.s.example/docs/9",),
            # no marker: must never pair
            ("https://s.example/plain/7",),
        ],
        "url string",
    )
    pairs = {
        (r.src_url, r.tgt_url, r.tgt_lang)
        for r in url_align_pairs(frontier).collect()
    }
    assert pairs == {
        ("https://www.s.example/en/docs/7",
         "https://www.s.example/de/docs/7", "de"),
        ("https://s.example/page?id=7&lang=en",
         "https://s.example/page?id=7&lang=fr", "fr"),
        ("https://en.s.example/docs/9",
         "https://ru.s.example/docs/9", "ru"),
    }


def test_plans_no_window_no_python(spark):
    pages = _pages(spark)
    for df in (
        hreflang_clusters(hreflang_links(pages), pages),
        url_align_pairs(pages.select("url")),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "BatchEvalPython" not in plan
