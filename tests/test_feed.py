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


def test_feed_entry_stream_exactly_once_across_restart(spark, tmp_path):
    """Two AvailableNow rounds on one checkpoint over OVERLAPPING feed
    snapshots (the second poll re-advertises g1/g2 and adds g3): every
    entry id lands exactly once across both runs."""
    from biothings_crawler_spark.streaming.feeds import feed_entry_stream

    def rss(items):
        blocks = "".join(
            f"<item><title>t{g}</title><link>https://h/{g}</link>"
            f"<guid>{g}</guid></item>" for g in items)
        return f"<rss><channel>{blocks}</channel></rss>"

    schema = "feed_url string, body string"
    src = tmp_path / "polls"
    src.mkdir()
    spark.createDataFrame(
        [("https://f/feed", rss(["g1", "g2"]))], schema
    ).coalesce(1).write.parquet(str(src / "p1"))

    dest = str(tmp_path / "entries_out")

    def run_round():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            feed_entry_stream(stream)
            .writeStream.format("parquet")
            .option("path", dest)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_round()
    first = {r.entry_id for r in spark.read.parquet(dest).collect()}
    assert first == {"g1", "g2"}

    # second poll overlaps the first and adds one new entry
    spark.createDataFrame(
        [("https://f/feed", rss(["g1", "g2", "g3"]))], schema
    ).coalesce(1).write.parquet(str(src / "p2"))
    run_round()
    rows = spark.read.parquet(dest).collect()
    ids = sorted(r.entry_id for r in rows)
    assert ids == ["g1", "g2", "g3"]  # no duplicates, one new entry


def test_render_atom_roundtrip_through_real_parser(spark):
    from pyspark.sql import functions as F

    from biothings_crawler_spark.sources.feed import parse_feed, render_atom

    rows = [
        ("https://f1/feed", f"e{i}", f"Title {i}", f"https://p/{i}",
         f"2025-01-{10 + i:02d}T00:00:00Z")
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "feed_url string, entry_id string, title string, "
              "link string, updated_iso string")
    rendered = render_atom(df, cap=5)
    out = rendered.collect()[0]
    assert out.n_entries == 5 and out.atom_xml.count("<entry>") == 5
    back = parse_feed(
        rendered.select(F.col("feed_url"),
                        F.col("atom_xml").alias("body")))
    got = {r.entry_id: (r.title, r.link, r.ts14)
           for r in back.collect()}
    # newest 5 survive the cap: e3..e7
    assert set(got) == {f"e{i}" for i in range(3, 8)}
    assert got["e7"] == ("Title 7", "https://p/7", "20250117000000")


def test_render_atom_escapes_titles(spark):
    from biothings_crawler_spark.sources.feed import render_atom

    df = spark.createDataFrame(
        [("f", "e1", "a & <b>", "https://p/1", "2025-01-01T00:00:00Z")],
        "feed_url string, entry_id string, title string, link string, "
        "updated_iso string")
    xml = render_atom(df).collect()[0].atom_xml
    assert "<title>a &amp; &lt;b&gt;</title>" in xml
