"""Parallel-corpus mining signals (operators/hreflang; tag extraction
itself is operators/extract.hreflang_map, tested in test_extract)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.extract import hreflang_map
from biothings_crawler_spark.operators.hreflang import (
    hreflang_clusters,
    url_align_pairs,
)


def _pages(spark):
    u = "https://site.example"

    def tags(*langs):
        return "".join(
            f'<link rel="alternate" hreflang="{l}" href="{u}/{l}/p/1"/>'
            for l in langs
        )

    rows = [
        # complete mutual group
        (f"{u}/de/p/1", "de", f"<head>{tags('en', 'de', 'fr')}</head>"),
        (f"{u}/en/p/1", "en", f"<head>{tags('en', 'de', 'fr')}</head>"),
        (f"{u}/fr/p/1", "fr", f"<head>{tags('en', 'de', 'fr')}</head>"),
        # partial declarer: only points at en -> en-keyed subcluster
        (f"{u}/it/p/1", "it", f"<head>{tags('en')}</head>"),
        # silent page: drops out of the cluster table
        (f"{u}/pt/p/1", "pt", "<head>no links here</head>"),
    ]
    return spark.createDataFrame(
        rows, "url string, lang string, htext string"
    ).select("url", "lang", F.encode("htext", "utf-8").alias("html"))


def test_clusters_min_url_key_and_partial_degradation(spark):
    pages = _pages(spark)
    out = {
        r.url: (r.cluster_id, r.lang)
        for r in hreflang_clusters(hreflang_map(pages), pages).collect()
    }
    u = "https://site.example"
    # the mutual trio all collapse to the lexicographic min (the de url)
    for l in ("de", "en", "fr"):
        assert out[f"{u}/{l}/p/1"][0] == f"{u}/de/p/1"
    # partial declarer: min(self, en-target) = the en url (en < it)
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
        hreflang_clusters(hreflang_map(pages), pages),
        url_align_pairs(pages.select("url")),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "BatchEvalPython" not in plan
