"""Seed-expansion sources: sitemap fixpoint, id-range, API pagination,
incremental cursor rounds."""

from pyspark.sql import functions as F

from biothings_crawler_spark.fixtures import corpus
from biothings_crawler_spark.sources.api import expand_api_pages, stop_at_short_page
from biothings_crawler_spark.sources.idrange import geo_seeds, id_range_seeds
from biothings_crawler_spark.sources.sitemap import expand_sitemaps, sitemap_seeds
from biothings_crawler_spark.streaming.incremental import (
    incremental_round,
    run_incremental,
)

N = 200


def test_sitemap_two_level_expansion(spark):
    sm = corpus.sitemaps_df(spark, N)
    start = sm.filter(F.col("sitemap_url") == "https://zenodo.example.org/sitemap.xml")
    urls = {r["url"] for r in expand_sitemaps(sm, start.select("sitemap_url")).collect()}
    expected = {corpus.url_of(i) for i in range(min(N, 400)) if corpus.source_of(i) == "zenodo"}
    assert urls == expected  # both leaf levels reached through the nested index


def test_sitemap_seeds_rule_filter_and_robots_start(spark):
    sm = corpus.sitemaps_df(spark, N)
    robots = corpus.robots_df(spark)
    # massbank: sitemap URL comes ONLY from robots.txt (massbank.py:10)
    seeds = sitemap_seeds(
        sm, robots, "massbank", "massbank.example.org",
        r"/MassBank/RecordDisplay\?id=.+", "jsonld",
    )
    urls = {r["url"] for r in seeds.collect()}
    assert urls  # found via robots
    assert all("RecordDisplay?id=" in u for u in urls)
    # the non-matching admin.jsp URL was rule-filtered out
    assert not any("admin.jsp" in u for u in urls)


def test_id_range_seeds(spark):
    s = id_range_seeds(spark, "nyu", "https://nyu.example.org/databases/record/", 10001, 10387)
    rows = s.collect()
    assert len(rows) == 387  # nyu.py:44-45
    assert rows[0]["url"].endswith("/10001")
    g = geo_seeds(spark, end=1000)
    assert g.count() == 1000
    assert g.first()["parser"] == "geo_table"


def test_api_expansion_and_errors(spark):
    api = corpus.api_pages_df(spark, N)
    seeds, errors = expand_api_pages(api, "zenodo_covid")
    assert seeds.count() == 24 - 4  # 3 pages x 8 hits; indices 4,9,14,19 missing
    errs = errors.collect()
    assert len(errs) == 4
    assert all(e["_type"] == "error" for e in errs)
    assert all('"missing_link":true' in e["_document"] for e in errs)


def test_stop_at_short_page(spark):
    api = corpus.api_pages_df(spark, N)
    kept = stop_at_short_page(api, "harvard", 10)
    pages = sorted(r["page_no"] for r in kept.collect())
    assert pages == [0, 1, 2]  # page 3 never consumed (harvard.py:63-71)


def test_incremental_round_semantics(spark):
    hits = spark.createDataFrame(
        [("a", "2026-01-01"), ("b", "2026-01-02"), ("c", "2026-01-03")],
        "id string, published_date string",
    )
    new, cur = incremental_round(hits, None, None)
    assert new.count() == 3 and cur == "2026-01-03"
    seen = spark.createDataFrame([("a",), ("b",)], "id string")
    new2, cur2 = incremental_round(hits, seen, "2026-01-02")
    rows = new2.collect()
    assert [r["id"] for r in rows] == ["c"] and cur2 == "2026-01-03"
    # empty increment keeps the old cursor
    new3, cur3 = incremental_round(hits.limit(0), None, "2026-01-05")
    assert new3.count() == 0 and cur3 == "2026-01-05"


def test_run_incremental_resumable_and_idempotent(spark, tmp_path):
    h1 = spark.createDataFrame(
        [("a", "2026-01-01"), ("b", "2026-01-02")], "id string, published_date string"
    )
    out1 = run_incremental(spark, h1, "figshare", str(tmp_path / "inc"))
    assert out1.count() == 2
    # second round: one genuinely new row + re-delivered old rows
    h2 = spark.createDataFrame(
        [("a", "2026-01-01"), ("b", "2026-01-02"), ("c", "2026-01-04")],
        "id string, published_date string",
    )
    out2 = run_incremental(spark, h2, "figshare", str(tmp_path / "inc"))
    assert [r["id"] for r in out2.collect()] == ["c"]  # idempotent re-run
