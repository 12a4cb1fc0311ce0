"""Soft-404 detection (operators/soft404)."""

from biothings_crawler_spark.operators.soft404 import (
    detect_soft404,
    host_signatures,
    soft404_report,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "host string, url string, status int, text string"
    )


def _probes(spark, rows):
    return spark.createDataFrame(rows, "host string, status int, text string")


def test_flags_only_template_matches_on_soft_hosts(spark):
    pages = _pages(spark, [
        ("a", "https://a/1", 200, "real content one"),
        ("a", "https://a/2", 200, "oops not found"),   # template body
        ("a", "https://a/3", 404, "oops not found"),   # real 404: not flagged
        ("b", "https://b/1", 200, "oops not found"),   # b probe 404s: honest
    ])
    probes = _probes(spark, [
        ("a", 200, "oops not found"),
        ("b", 404, "server 404 page"),
    ])
    got = {r["url"]: r["is_soft404"]
           for r in detect_soft404(pages, probes).collect()}
    assert got == {
        "https://a/1": False,
        "https://a/2": True,
        "https://a/3": False,
        "https://b/1": False,
    }


def test_signature_normalizes_case_and_whitespace(spark):
    pages = _pages(spark, [("a", "https://a/x", 200, "Oops   NOT\tfound")])
    probes = _probes(spark, [("a", 200, "  oops not FOUND ")])
    assert detect_soft404(pages, probes).collect()[0]["is_soft404"] is True


def test_host_without_probe_never_flagged(spark):
    pages = _pages(spark, [("c", "https://c/1", 200, "anything")])
    probes = _probes(spark, [("a", 200, "anything")])
    assert detect_soft404(pages, probes).collect()[0]["is_soft404"] is False


def test_duplicate_probes_deterministic_signature(spark):
    sigs = host_signatures(_probes(spark, [
        ("a", 200, "zz template"), ("a", 200, "aa template"),
    ])).collect()
    assert len(sigs) == 1  # min() picks one, stable across runs


def test_report_ppm(spark):
    pages = _pages(spark, [
        ("a", "https://a/1", 200, "t"),
        ("a", "https://a/2", 200, "x"),
        ("a", "https://a/3", 200, "t"),
        ("a", "https://a/4", 200, "y"),
    ])
    probes = _probes(spark, [("a", 200, "t")])
    rep = soft404_report(detect_soft404(pages, probes)).collect()[0]
    assert (rep["n_pages"], rep["n_soft404"], rep["soft404_ppm"]) == (4, 2, 500000)


def test_detector_joins_broadcast_not_sortmerge(spark):
    pages = _pages(spark, [("a", "https://a/1", 200, "t")] * 50)
    probes = _probes(spark, [("a", 200, "t")])
    plan = detect_soft404(pages, probes)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
