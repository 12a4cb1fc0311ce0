"""Anchor-text aggregation: host collapsing, ranking, field assembly."""

from biothings_crawler_spark.operators.anchors import (
    anchor_field,
    anchor_summary,
)


def _links(spark, rows):
    return spark.createDataFrame(
        rows, "src_host string, dst long, anchor string")


def test_host_collapse_beats_sitewide_nav(spark):
    # host A spams 'click here' on 100 pages at target 1; three
    # distinct hosts each say 'docs' once -> docs (3 hosts) outranks
    # here/click (1 host, 100 links)
    rows = [("a.com", 1, "click here")] * 100 + [
        ("b.com", 1, "docs"), ("c.com", 1, "docs"), ("d.com", 1, "docs")]
    got = anchor_summary(_links(spark, rows),
                         "src_host", "dst", "anchor", m=2).collect()
    assert [(r.term, r.n_hosts, r.n_links, r.rank) for r in got] == [
        ("docs", 3, 3, 1), ("click", 1, 100, 2)]


def test_rank_ties_break_on_links_then_term(spark):
    rows = [("a.com", 5, "alpha beta"), ("b.com", 5, "beta gamma"),
            ("a.com", 5, "gamma")]
    got = anchor_summary(_links(spark, rows),
                         "src_host", "dst", "anchor", m=4).collect()
    # beta: 2 hosts; alpha and gamma both (hosts=2? no): alpha 1 host
    # 1 link; gamma 2 hosts 2 links -> beta and gamma tie at 2 hosts
    # 2 links, term breaks the tie; alpha last
    assert [(r.term, r.n_hosts, r.n_links, r.rank) for r in got] == [
        ("beta", 2, 2, 1), ("gamma", 2, 2, 2), ("alpha", 1, 1, 3)]


def test_anchor_field_repeats_by_host_votes(spark):
    rows = [("a.com", 1, "docs"), ("b.com", 1, "docs"),
            ("c.com", 1, "home"), ("a.com", 2, "misc")]
    got = {r.dst: r.anchor for r in anchor_field(
        _links(spark, rows), "src_host", "dst", "anchor", m=2).collect()}
    assert got[1] == "docs docs home"
    assert got[2] == "misc"


def test_m_truncates_per_target(spark):
    rows = [("a.com", 9, "one two three four")]
    got = anchor_summary(_links(spark, rows),
                         "src_host", "dst", "anchor", m=2).collect()
    assert len(got) == 2 and all(r.rank <= 2 for r in got)
