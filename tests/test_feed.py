"""RSS/Atom feed parsing (sources/feed)."""

from biothings_crawler_spark.sources.feed import feed_new_entries, parse_feed

_RSS = """<rss><channel>
<item><title><![CDATA[Breaking: <b>news</b>]]></title>
<link>https://h.example.org/1</link><guid>g1</guid>
<pubDate>Tue, 5 Aug 2026 07:30:05 GMT</pubDate></item>
<item><title>plain</title><link>https://h.example.org/2</link>
<guid>g2</guid></item>
<item><title>no link - dropped</title><guid>g3</guid></item>
</channel></rss>"""

_ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<entry><title>atom one</title><link rel="alternate"
 href="https://a.example.org/x"/><id>ia</id>
<updated>2026-08-05T10:20:30Z</updated></entry>
</feed>"""


def _df(spark, bodies):
    return spark.createDataFrame(
        [(f"https://f{i}.example.org/feed", b) for i, b in enumerate(bodies)],
        "feed_url string, body string")


def test_rss_fields_cdata_and_ts14(spark):
    rows = {r.entry_id: r for r in parse_feed(_df(spark, [_RSS])).collect()}
    assert set(rows) == {"g1", "g2"}  # linkless item dropped
    assert rows["g1"].title == "Breaking: <b>news</b>"  # CDATA stripped
    assert rows["g1"].ts14 == "20260805073005"  # 1-digit day zero-padded
    assert rows["g1"].kind == "rss"
    assert rows["g2"].ts14 == ""  # dateless


def test_atom_fields(spark):
    r = parse_feed(_df(spark, [_ATOM])).collect()[0]
    assert r.kind == "atom"
    assert r.link == "https://a.example.org/x"  # href attr, rel present
    assert r.entry_id == "ia"
    assert r.ts14 == "20260805102030"


def test_feed_new_entries_antijoin(spark):
    parsed = parse_feed(_df(spark, [_RSS]))
    seen = spark.createDataFrame([("g1",)], "entry_id string")
    new = [r.entry_id for r in feed_new_entries(parsed, seen).collect()]
    assert new == ["g2"]
