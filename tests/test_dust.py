"""DUST rule learning (operators/dust)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.dust import (
    dust_params,
    strip_learned_params,
)


def _corpus(spark):
    # page P's content depends only on P; sid varies freely; v changes
    # the content; lone= appears once per residual (no experiments)
    rows = []
    for page in range(4):
        for sid in range(3):
            for v in range(2):
                rows.append(
                    (f"https://h/p{page}?v={v}&sid={sid}{page}{v}&lone=1",
                     f"c{page}{v}")
                )
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_verdicts(spark):
    out = {r.param: r for r in dust_params(_corpus(spark)).collect()}
    # sid: per (page, v) residual, 3 distinct sids, 1 content -> strip
    assert out["sid"].strip and out["sid"].irrelevant_ppm == 1_000_000
    assert out["sid"].n_groups_multi == 8
    # v: residual groups keyed by unique sid -> no multi-value groups
    # (sid encodes v), conservative keep
    assert not out["v"].strip
    # lone: constant value -> zero experiments -> keep
    assert not out["lone"].strip and out["lone"].n_groups_multi == 0


def test_relevant_param_with_support_is_kept(spark):
    # v varies within groups that share everything else, and content
    # follows v -> experiments exist and show relevance
    rows = [
        (f"https://h/p{p}?v={v}", f"c{p}{v}") for p in range(5) for v in range(2)
    ]
    df = spark.createDataFrame(rows, "url string, content_hash string")
    out = {r.param: r for r in dust_params(df).collect()}
    assert out["v"].n_groups_multi == 5 and out["v"].n_irrelevant == 0
    assert not out["v"].strip


def test_strip_application_preserves_order_and_bare_path(spark):
    rules = spark.createDataFrame(
        [("sid", 5, 5, 1_000_000, True), ("v", 5, 0, 0, False)],
        "param string, n_groups_multi long, n_irrelevant long, "
        "irrelevant_ppm long, strip boolean",
    )
    df = spark.createDataFrame(
        [("https://h/p?a=1&sid=9&v=2",), ("https://h/p?sid=9",),
         ("https://h/plain",)],
        "url string",
    )
    got = [r.url for r in strip_learned_params(df, rules).collect()]
    assert sorted(got) == sorted(
        ["https://h/p?a=1&v=2", "https://h/p", "https://h/plain"]
    )


def test_no_strip_rules_is_identity(spark):
    rules = dust_params(
        spark.createDataFrame([("https://h/p?a=1", "c")],
                              "url string, content_hash string")
    )
    df = spark.createDataFrame([("https://h/p?a=1&b=2",)], "url string")
    assert strip_learned_params(df, rules).collect()[0].url == "https://h/p?a=1&b=2"


def test_plan_shape(spark):
    plan = (
        dust_params(_corpus(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan and "BatchEvalPython" not in plan
    assert "Expand" in plan  # the two count-distincts share one agg


def test_url_path_templates_generalization(spark):
    from biothings_crawler_spark.operators.dust import url_path_templates

    urls = [
        "https://a.com/article/123/view",
        "https://a.com/article/98765/view",     # collapses with above
        "https://a.com/static/css/main.css",
        "https://a.com/session/deadbeefcafe1234/cart",
        "https://a.com/u/deadbeef-cafe-1234-abcd-0123456789ab",
        "https://a.com/v2/api/7/items",          # digits in two spots
        "https://a.com",                         # empty path -> '/'
        "https://b.com/article/5/view",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {(r["host"], r["signature"]): r
           for r in url_path_templates(df).collect()}
    a = {sig: r for (h, sig), r in got.items() if h == "a.com"}
    assert a["/article/<d>/view"]["n_urls"] == 2
    assert a["/article/<d>/view"]["rank"] == 1
    assert "/static/css/main.css" in a
    assert "/session/<hex>/cart" in a
    assert "/u/<uuid>" in a
    assert "/v<d>/api/<d>/items" in a
    assert "/" in a
    assert got[("b.com", "/article/<d>/view")]["share_ppm"] == 1_000_000
