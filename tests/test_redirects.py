"""Redirect-chain tracing (harvard.py:104-122 rebuild): multi-hop
chains, terminal statuses, connection errors, cycle guard."""

import json

from pyspark.sql import functions as F

from biothings_crawler_spark.operators.redirects import (
    redirect_error_docs,
    trace_redirects,
)

HOPS = [
    # a 3-hop chain: a -> b -> c -> d(200)
    ("http://x/a", "http://x/b", 301),
    ("http://x/b", "http://x/c", 302),
    ("http://x/c", "http://x/d", 301),
    ("http://x/d", None, 200),
    # direct 404 final
    ("http://x/e", None, 404),
    # 2-cycle: f <-> g
    ("http://x/f", "http://x/g", 301),
    ("http://x/g", "http://x/f", 302),
    # redirect into a missing URL
    ("http://x/h", "http://x/missing", 301),
]


def _trace(spark, max_hops=10):
    hops = spark.createDataFrame(HOPS, "url string, next_url string, status int")
    seeds = spark.createDataFrame(
        [("http://x/a",), ("http://x/e",), ("http://x/f",), ("http://x/h",),
         ("http://x/nowhere",)],
        "url string",
    )
    rows = trace_redirects(seeds, hops, max_hops=max_hops).collect()
    return {r["_id"]: r for r in rows}

def test_three_hop_chain_resolves(spark):
    got = _trace(spark)
    a = got["http://x/a"]
    assert a["success"] and a["location"] == "http://x/d" and a["status"] == 200
    hist = json.loads(a["history_json"])
    assert hist == [
        {"status": 301, "url": "http://x/a"},
        {"status": 302, "url": "http://x/b"},
        {"status": 301, "url": "http://x/c"},
    ]


def test_terminal_statuses_and_errors(spark):
    got = _trace(spark)
    e = got["http://x/e"]
    assert e["success"] and e["status"] == 404 and e["history_json"] == "[]"
    nowhere = got["http://x/nowhere"]
    assert not nowhere["success"] and nowhere["exception"] == "connection error"
    h = got["http://x/h"]
    assert not h["success"] and h["exception"] == "connection error"
    assert json.loads(h["history_json"]) == [{"status": 301, "url": "http://x/h"}]


def test_cycle_hits_loop_guard(spark):
    got = _trace(spark, max_hops=6)
    f = got["http://x/f"]
    assert not f["success"] and f["exception"] == "too many redirects"
    assert len(json.loads(f["history_json"])) == 6  # one entry per hop taken


def test_round_state_shrinks_geometrically(spark):
    """Only the unresolved sliver is carried (and checkpointed) per
    round: the per-round pending counts must be non-increasing and
    drop as chains resolve — resolved rows are never re-materialized."""
    hops = spark.createDataFrame(HOPS, "url string, next_url string, status int")
    seeds = spark.createDataFrame(
        [("http://x/a",), ("http://x/e",), ("http://x/h",), ("http://x/nowhere",)],
        "url string",
    )
    sizes: list = []
    got = {r["_id"]: r
           for r in trace_redirects(seeds, hops, round_sizes=sizes).collect()}
    # round 1 carries all 4; e + nowhere resolve immediately, h after
    # its one redirect, a walks its 3-hop chain alone
    assert sizes == [4, 2, 1, 1]
    assert got["http://x/a"]["success"] and got["http://x/a"]["status"] == 200
    assert not got["http://x/nowhere"]["success"]


def test_error_doc_sink_shape(spark):
    hops = spark.createDataFrame(HOPS, "url string, next_url string, status int")
    seeds = spark.createDataFrame([("http://x/nowhere",)], "url string")
    docs = redirect_error_docs(trace_redirects(seeds, hops)).collect()
    assert len(docs) == 1 and docs[0]["_type"] == "error"
    doc = json.loads(docs[0]["_document"])
    assert doc == {"_id": "http://x/nowhere",
                   "exception": "connection error", "success": False}


def test_pagination_assembly_lanes(spark):
    from biothings_crawler_spark.operators.redirects import (
        assemble_pagination,
    )

    pages = spark.createDataFrame([
        ("a0", "a1"), ("a1", "a2"), ("a2", None),   # 3-page series
        ("b0", None),                               # single page
        ("c0", "c1"), ("c1", "c0"),                 # cycle back to start?
        ("d0", "d1"), ("d1", "d2"), ("d2", "d1"),   # cycle to mid
    ], "url string, next_url string")
    got = {r.series: (r.n_pages, r.chain, r.status)
           for r in assemble_pagination(pages).collect()}
    assert got["a0"] == (3, "a0|a1|a2", "complete")
    assert got["b0"] == (1, "b0", "complete")
    # c0<->c1: both are targets, no start — a pure cycle emits nothing
    assert "c0" not in got and "c1" not in got
    assert got["d0"] == (3, "d0|d1|d2", "cycle")
    assert len(got) == 3


def test_pagination_truncation_and_dangling_next(spark):
    from biothings_crawler_spark.operators.redirects import (
        assemble_pagination,
    )

    long_chain = [(f"p{i}", f"p{i+1}") for i in range(6)] + [("p6", None)]
    got = {r.series: r for r in assemble_pagination(
        spark.createDataFrame(long_chain, "url string, next_url string"),
        max_hops=3).collect()}
    assert got["p0"].status == "truncated" and got["p0"].n_pages == 4
    # next pointing at an unfetched page: series completes with the
    # dangling url included (it IS part of the article)
    got2 = {r.series: (r.n_pages, r.chain, r.status)
            for r in assemble_pagination(spark.createDataFrame(
                [("x0", "x1")], "url string, next_url string")).collect()}
    assert got2["x0"] == (2, "x0|x1", "complete")


def test_client_redirects_lanes(spark):
    from biothings_crawler_spark.operators.redirects import client_redirects

    pages = spark.createDataFrame(
        [
            # immediate absolute meta refresh -> sneaky
            (1, "https://a.com/x/p",
             '<meta http-equiv="refresh" content="0; url=https://b.com/t">'),
            # double-quoted content carrying a single-quoted root-relative url
            (2, "https://a.com/x/p",
             "<meta http-equiv=refresh content=\"5;URL='/page2'\">"),
            # content-first attribute order, dir-relative target
            (3, "https://a.com/x/p",
             '<meta content="2; url=next.html" http-equiv="Refresh">'),
            # delay-only refresh: reload-self, not a redirect
            (4, "https://a.com/x/p",
             '<meta http-equiv="refresh" content="30">'),
            # scripted assignment
            (5, "https://a.com/x/p",
             '<script>window.location.href="https://js.org/5";</script>'),
            # scripted replace, root-relative
            (6, "https://a.com/x/p",
             "<script>location.replace('/moved/6')</script>"),
            # both signals on one page -> two rows
            (7, "https://a.com/x/p",
             '<meta http-equiv="refresh" content="0;url=/m7">'
             '<script>location.replace("/j7")</script>'),
            (8, "https://a.com/x/p", "<p>no redirect</p>"),
        ],
        "doc_id long, url string, html_text string",
    )
    rows = {(r["id"], r["kind"]): r for r in client_redirects(pages).collect()}
    assert set(rows) == {(1, "meta"), (2, "meta"), (3, "meta"), (5, "js"),
                         (6, "js"), (7, "meta"), (7, "js")}
    r1 = rows[(1, "meta")]
    assert (r1["delay"], r1["target_abs"], r1["sneaky"]) == (
        0, "https://b.com/t", 1)
    r2 = rows[(2, "meta")]
    assert (r2["delay"], r2["target"], r2["target_abs"], r2["sneaky"]) == (
        5, "/page2", "https://a.com/page2", 0)
    r3 = rows[(3, "meta")]
    assert (r3["delay"], r3["target"], r3["target_abs"]) == (
        2, "next.html", None)
    assert rows[(5, "js")]["target_abs"] == "https://js.org/5"
    assert rows[(5, "js")]["sneaky"] == 1
    assert rows[(6, "js")]["target_abs"] == "https://a.com/moved/6"
    assert rows[(7, "meta")]["target_abs"] == "https://a.com/m7"
    assert rows[(7, "js")]["target_abs"] == "https://a.com/j7"


def test_client_redirects_word_boundaries(spark):
    from biothings_crawler_spark.operators.redirects import (
        client_redirects,
    )

    pages = spark.createDataFrame(
        [
            (1, "https://a.com/p",
             "<p>memory allocation = 'dynamic' is used</p>"),
            (2, "https://a.com/p",
             "<script>geolocation.replace('city')</script>"),
            (3, "https://a.com/p",
             '<script>location.href="/real"</script>'),
        ],
        "doc_id long, url string, html_text string",
    )
    rows = {r["id"]: r for r in client_redirects(pages).collect()}
    assert set(rows) == {3}              # prose/geolocation rejected
    assert rows[3]["target_abs"] == "https://a.com/real"
