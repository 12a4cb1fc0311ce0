"""robots.txt parsing (operators/robots.parse_robots_txt)."""

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.robots import parse_robots_txt

BODY = """# top comment
User-agent: *
Disallow: /private/
Allow: /private/pub   # inline comment
Crawl-delay: fast
Crawl-delay: 7

User-agent: otherbot
User-agent: SparkBot
Allow: /shared/
Disallow: /tmp/
Crawl-delay: 3
Sitemap: https://h.example.org/sitemap.xml
no colon line
Unknown-key: x
Disallow:

User-agent: sparkbot
Disallow: /deep/
Crawl-delay: 9
"""


def _parse(spark, agent):
    df = spark.createDataFrame(
        [("h.example.org", BODY), ("empty.org", "# nothing\n\nfoo")],
        "host string, body string",
    )
    return {r.host: r for r in parse_robots_txt(df, agent=agent).collect()}


def test_specific_groups_union_and_exclude_star(spark):
    out = _parse(spark, "sparkbot")
    r = out["h.example.org"]
    # union of BOTH sparkbot groups (the multi-UA one matched via
    # lowercased 'SparkBot'), star rules excluded entirely
    assert r.allow == ["/shared/"]
    assert r.disallow == ["/tmp/", "/deep/"]
    assert r.crawl_delay == 9          # last-wins within the class
    assert r.sitemap_urls == ["https://h.example.org/sitemap.xml"]


def test_star_fallback_and_junk_tolerance(spark):
    out = _parse(spark, "nobody")
    r = out["h.example.org"]
    assert r.allow == ["/private/pub"]  # inline comment stripped
    assert r.disallow == ["/private/"]  # empty 'Disallow:' dropped
    assert r.crawl_delay == 7           # non-integer 'fast' ignored
    # sitemap is global: collected even though the agent matched nothing
    assert r.sitemap_urls == ["https://h.example.org/sitemap.xml"]
    e = out["empty.org"]
    assert e.allow == [] and e.disallow == [] and e.crawl_delay is None


def test_matching_group_with_no_rules_allows_everything(spark):
    # RFC 9309: a group naming the agent, even rule-less, wins over '*'
    body = "User-agent: *\nDisallow: /\n\nUser-agent: sparkbot\n"
    df = spark.createDataFrame([("h", body)], "host string, body string")
    r = parse_robots_txt(df, agent="sparkbot").collect()[0]
    assert r.allow == [] and r.disallow == []


def test_blank_line_splits_consecutive_agent_headers(spark):
    # the blank line ends the header block, so the second UA line
    # starts a NEW group — star group has no rules for sparkbot
    body = "User-agent: sparkbot\n\nUser-agent: *\nDisallow: /x/\n"
    df = spark.createDataFrame([("h", body)], "host string, body string")
    r = parse_robots_txt(df, agent="sparkbot").collect()[0]
    assert r.disallow == []  # sparkbot group is rule-less; '*' excluded


def test_rules_before_any_group_are_ignored(spark):
    body = "Disallow: /early/\nUser-agent: *\nDisallow: /late/\n"
    df = spark.createDataFrame([("h", body)], "host string, body string")
    r = parse_robots_txt(df, agent="anybot").collect()[0]
    assert r.disallow == ["/late/"]


def test_parse_plan_is_row_local_jvm(spark):
    df = spark.createDataFrame([("h", BODY)], "host string, body string")
    plan = (
        parse_robots_txt(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parse_feeds_apply_robots_and_budgets(spark):
    from biothings_crawler_spark.operators.politeness import (
        apply_robots,
        host_budgets,
    )

    df = spark.createDataFrame([("h.example.org", BODY)], "host string, body string")
    parsed = parse_robots_txt(df, agent="sparkbot")
    cand = spark.createDataFrame(
        [("h.example.org", f"https://h.example.org{p}")
         for p in ["/tmp/x", "/deep/a", "/shared/ok", "/private/anything"]],
        "host string, url_canon string",
    )
    kept = {r.url_canon for r in apply_robots(cand, parsed).collect()}
    # /tmp/ and /deep/ blocked by the specific groups; /private/ is a
    # star rule and does NOT apply once a specific group matched
    assert kept == {
        "https://h.example.org/shared/ok",
        "https://h.example.org/private/anything",
    }
    b = host_budgets(parsed, round_seconds=60, default_budget=100).collect()[0]
    assert b.budget == 6  # floor(60 / crawl_delay 9)


def test_apply_robots_rfc_wildcards_anchor_and_tie(spark):
    """RFC 9309 matching: '*' spans path chars, trailing '$' anchors,
    longest rule text wins, equal-length ties go to allow, inner
    regex metachars in rules are literal."""
    from biothings_crawler_spark.operators.politeness import apply_robots_rfc

    robots = spark.createDataFrame(
        [("h", ["/private/pub/", "/p/10"],
          ["/private/*/secret$", "/*.pdf$", "/p/1*", "/a[1]"])],
        "host string, allow array<string>, disallow array<string>",
    )
    paths = ["/private/pub/secret",   # dis 18 > allow 13 -> blocked
             "/private/x/secretive",  # '$' anchor: no match -> admitted
             "/doc.pdf",              # wildcard+anchor -> blocked
             "/doc.pdfx",             # anchor: admitted
             "/p/100",                # tie 5 == 5 -> allow wins
             "/p/19",                 # dis '/p/1*' only -> blocked
             "/a[1]x",                # bracket is LITERAL -> blocked
             "/ok"]
    cand = spark.createDataFrame(
        [("h", f"https://h{p}") for p in paths],
        "host string, url_canon string",
    )
    admitted = {r["url_canon"][9:] for r in apply_robots_rfc(cand, robots).collect()}
    assert admitted == {"/private/x/secretive", "/doc.pdfx", "/p/100", "/ok"}
    # host with no robots row at all -> everything admitted
    other = spark.createDataFrame([("z", "https://z/x.pdf")],
                                  "host string, url_canon string")
    assert apply_robots_rfc(other, robots).count() == 1
