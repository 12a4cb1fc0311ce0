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
