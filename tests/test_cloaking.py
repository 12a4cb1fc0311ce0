"""Dual-UA cloaking detection: verdict ladder and per-host census."""

from biothings_crawler_spark.operators.cloaking import (
    cloaking_census,
    cloaking_verdicts,
)

FETCHES = [
    # identical payloads
    ("u1", "h1", "bot", "alpha beta gamma"),
    ("u1", "h1", "browser", "alpha beta gamma"),
    # whitespace/case-only difference -> dynamic
    ("u2", "h1", "bot", "ALPHA  Beta\tgamma"),
    ("u2", "h1", "browser", "alpha beta gamma"),
    # keyword stuffing -> cloaked via jaccard
    ("u3", "h2", "bot", "buy pills buy pills buy pills"),
    ("u3", "h2", "browser", "alpha beta gamma delta"),
    # tripled content -> cloaked via ratio despite jaccard = 1.0
    ("u4", "h2", "bot", "alpha beta alpha beta alpha beta"),
    ("u4", "h2", "browser", "alpha beta"),
    # one-word drift -> differs
    ("u5", "h2", "bot", "alpha beta gamma delta zz"),
    ("u5", "h2", "browser", "alpha beta gamma delta"),
    # missing browser fetch -> partial
    ("u6", "h3", "bot", "alpha"),
]


def test_verdict_ladder(spark):
    f = spark.createDataFrame(
        FETCHES, "url string, host string, ua string, text string")
    rows = {r["url"]: r for r in cloaking_verdicts(f).collect()}
    assert {u: r["verdict"] for u, r in rows.items()} == {
        "u1": "same", "u2": "dynamic", "u3": "cloaked",
        "u4": "cloaked", "u5": "differs", "u6": "partial",
    }
    # exact integer evidence columns
    assert rows["u3"]["jaccard_ppm"] == 0
    assert rows["u4"]["jaccard_ppm"] == 1_000_000
    assert rows["u4"]["ratio_ppm"] == 3_000_000
    assert rows["u5"]["jaccard_ppm"] == 800_000  # 4/5
    assert rows["u6"]["n_bot"] is None and rows["u6"]["jaccard_ppm"] is None


def test_census_rollup(spark):
    f = spark.createDataFrame(
        FETCHES, "url string, host string, ua string, text string")
    c = {r["host"]: r for r in
         cloaking_census(cloaking_verdicts(f)).collect()}
    assert c["h2"]["n_urls"] == 3 and c["h2"]["n_cloaked"] == 2
    assert c["h2"]["cloaked_ppm"] == 666_666
    assert c["h1"]["n_cloaked"] == 0 and c["h1"]["n_dynamic"] == 1
    assert c["h3"]["n_partial"] == 1
