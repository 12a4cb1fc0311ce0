"""Sitemap-vs-crawl coverage audit (operators/audit)."""

from biothings_crawler_spark.operators.audit import sitemap_coverage


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, url string")


def test_census_exact(spark):
    declared = _df(spark, [
        ("h1", "u1"), ("h1", "u2"), ("h1", "u3"),   # u3 never fetched
        ("h2", "u9"),                                # h2: nothing fetched
    ])
    crawled = _df(spark, [
        ("h1", "u1"), ("h1", "u2"), ("h1", "u4"),   # u4 undeclared
        ("h1", "u1"),                                # refetch: distinct()
        ("h3", "u7"),                                # h3: no sitemap
    ])
    got = {r["host"]: r.asDict()
           for r in sitemap_coverage(declared, crawled).collect()}
    h1 = got["h1"]
    assert (h1["n_declared"], h1["n_crawled"], h1["n_both"],
            h1["n_gaps"], h1["n_orphans"]) == (3, 3, 2, 1, 1)
    assert h1["coverage_ppm"] == 2 * 10**6 // 3
    assert h1["orphan_ppm"] == 10**6 // 3
    # declared-only host: zero coverage, orphan ratio guarded at 0
    assert got["h2"]["coverage_ppm"] == 0
    assert got["h2"]["orphan_ppm"] == 0
    # sitemap-less host: everything is an orphan, coverage guarded
    assert got["h3"]["orphan_ppm"] == 10**6
    assert got["h3"]["coverage_ppm"] == 0


def test_plan_one_join_one_agg(spark):
    d = _df(spark, [("h", "a")])
    c = _df(spark, [("h", "b")])
    plan = sitemap_coverage(d, c)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") \
        + plan.count("ShuffledHashJoin") == 1
