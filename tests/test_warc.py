"""WARC record parsing (sources/warc)."""

from datetime import datetime, timezone

from biothings_crawler_spark.sources.warc import parse_warc_records, warc_pages


def _rec(
    *,
    wtype="response",
    uri="https://h.example.org/p/1",
    date="2026-08-17T12:00:05Z",
    body="<html>x</html>",
    http=True,
):
    payload = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{body}" if http else body
    )
    uri_line = f"WARC-Target-URI: {uri}\r\n" if uri else ""
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n{uri_line}"
        f"WARC-Date: {date}\r\nContent-Length: {len(payload)}\r\n\r\n{payload}"
    ).encode()


def _df(spark, records):
    return spark.createDataFrame([(r,) for r in records], "record binary")


def test_parse_fields_and_epoch(spark):
    out = parse_warc_records(_df(spark, [_rec()])).collect()[0]
    assert out.url == "https://h.example.org/p/1"
    assert out.warc_type == "response"
    expect = int(
        datetime(2026, 8, 17, 12, 0, 5, tzinfo=timezone.utc).timestamp() * 1_000_000
    )
    assert out.warc_ts_us == expect
    assert out.payload.startswith("HTTP/1.1 200 OK\r\n")
    assert out.content_length == len(out.payload)


def test_torn_record_degrades_to_nulls(spark):
    out = parse_warc_records(_df(spark, [_rec(uri=None), b"garbage no crlf"])).collect()
    assert out[0].url is None and out[0].warc_type == "response"
    torn = out[1]
    assert torn.url is None and torn.warc_ts_us is None
    assert torn.payload == "garbage no crlf"  # no header block -> passthrough


def test_warc_pages_filters_and_strips_http(spark):
    recs = [
        _rec(body="<html>keep</html>"),
        _rec(wtype="request", body="GET / HTTP/1.1", http=False),
        _rec(uri=None),
        _rec(body="raw body no http header", http=False),
    ]
    rows = warc_pages(_df(spark, recs)).collect()
    assert len(rows) == 2
    by_html = sorted(r.html for r in rows)
    assert by_html == ["<html>keep</html>", "raw body no http header"]


def test_warc_plan_is_jvm_only(spark):
    plan = (
        warc_pages(_df(spark, [_rec()]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # narrow projection end-to-end


def test_gzip_member_framing_roundtrip_and_cdx_addressing(spark):
    """Common Crawl's .warc.gz layout: one gzip member per record,
    concatenated.  The splitter must recover every record, and each
    (offset, comp_length) slice must gunzip STANDALONE — the property
    CDX ranged fetches rely on."""
    import gzip

    from biothings_crawler_spark.sources.warc import (
        gzip_member_files,
        split_warc_gz_members,
    )

    recs = [(i % 2, f"WARC/1.0\r\nrec {i} body {'x' * (i * 7)}".encode())
            for i in range(8)]
    df = spark.createDataFrame(recs, "file_id long, record binary")
    files = gzip_member_files(df)
    blobs = {r["file_id"]: bytes(r["content"]) for r in files.collect()}
    assert len(blobs) == 2
    out = split_warc_gz_members(files).collect()
    assert len(out) == 8
    got = {(r["file_id"], bytes(r["record"])) for r in out}
    assert got == {(f, r) for f, r in recs}
    for r in out:
        blob = blobs[r["file_id"]]
        sl = blob[r["offset"]: r["offset"] + r["comp_length"]]
        assert gzip.decompress(sl) == bytes(r["record"])  # standalone member
    # member_no is dense per file, offsets strictly increasing
    for fid in (0, 1):
        ms = sorted((r["member_no"], r["offset"]) for r in out
                    if r["file_id"] == fid)
        assert [m for m, _ in ms] == [0, 1, 2, 3]
        assert all(a < b for (_, a), (_, b) in zip(ms, ms[1:]))


def test_gzip_member_split_torn_trailing_member(spark):
    """A truncated final member (mid-transfer kill) becomes a
    split_err row covering the torn byte range — data, never a task
    failure OR a silent drop."""
    import gzip

    from biothings_crawler_spark.sources.warc import split_warc_gz_members

    good = gzip.compress(b"whole record", mtime=0)
    torn = gzip.compress(b"lost record", mtime=0)[:10]  # header only
    df = spark.createDataFrame(
        [(1, good + torn)], "file_id long, content binary"
    )
    out = sorted(split_warc_gz_members(df).collect(),
                 key=lambda r: r["member_no"])
    assert len(out) == 2
    assert bytes(out[0]["record"]) == b"whole record"
    assert out[0]["split_err"] is None
    assert out[1]["record"] is None
    assert out[1]["split_err"] == "torn gzip member (no trailer)"
    assert out[1]["offset"] == len(good) and out[1]["comp_length"] == 10


def test_gzip_member_split_resyncs_after_mid_blob_corruption(spark):
    """Bit-rot in member 2 of 4 must not drop members 3-4: the walk
    emits a split_err row for the damaged range and RESYNCS at the
    next gzip magic."""
    import gzip

    from biothings_crawler_spark.sources.warc import split_warc_gz_members

    recs = [b"record one", b"record two", b"record three", b"record four"]
    members = [gzip.compress(r, mtime=0) for r in recs]
    # flip a byte in member 2's deflate data (past the 10-byte header)
    bad = bytearray(members[1])
    bad[12] ^= 0xFF
    blob = members[0] + bytes(bad) + members[2] + members[3]
    df = spark.createDataFrame([(1, blob)], "file_id long, content binary")
    out = sorted(split_warc_gz_members(df).collect(),
                 key=lambda r: r["offset"])
    good = [bytes(r["record"]) for r in out if r["split_err"] is None]
    errs = [r for r in out if r["split_err"] is not None]
    assert good == [b"record one", b"record three", b"record four"]
    assert len(errs) >= 1  # damaged range reported, not swallowed
    # recovered members keep standalone (offset, length) addressing
    for r in out:
        if r["split_err"] is None:
            sl = blob[r["offset"]: r["offset"] + r["comp_length"]]
            assert gzip.decompress(sl) == bytes(r["record"])


def test_cdx_from_members_ranged_get_roundtrip(spark):
    """The compressed-offset CDX property CC readers rely on: for every
    index row, blob[offset : offset+length] gunzips standalone into the
    WARC record whose Target-URI the row names — no window in the plan
    (offsets come free from the member walk)."""
    import gzip

    from pyspark.sql import functions as F

    from biothings_crawler_spark.sources.cdx import cdx_from_members
    from biothings_crawler_spark.sources.warc import (
        gzip_member_files,
        render_warc,
        split_warc_gz_members,
    )
    import datetime as dt

    pages = spark.createDataFrame(
        [(f"https://h{i % 3}.example.org/p/{i}",
          dt.datetime(2026, 3, 1, 12, 0, i),
          f"<html>page {i} body {'z' * (i * 13)}</html>".encode(),
          i % 4)
         for i in range(10)],
        "url string, warc_ts timestamp_ntz, html binary, file_id long",
    )
    recs = render_warc(pages, keep=("file_id",))
    files = gzip_member_files(recs)
    members = split_warc_gz_members(files)
    idx = cdx_from_members(members)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    blobs = {r["file_id"]: bytes(r["content"]) for r in files.collect()}
    rows = idx.collect()
    assert len(rows) == 10
    for r in rows:
        sl = blobs[int(r["warc_file"])][r["offset"]: r["offset"] + r["length"]]
        rec = gzip.decompress(sl).decode()
        assert f"WARC-Target-URI: {r['url']}\r\n" in rec
        assert r["status"] == "200" and r["mime"] == "text/html"
        assert r["ts14"].startswith("20260301")


def test_wat_render_roundtrip_json_and_framing(spark):
    import json

    from biothings_crawler_spark.sources.warc import render_wat

    pages = spark.createDataFrame(
        [
            (
                "https://h.example.org/a",
                datetime(2026, 8, 17, 12, 0, 5, tzinfo=timezone.utc),
                b'<html><head><title>T "q" \\ s</title></head><body>'
                b'<a href="https://h.example.org/b">x</a>'
                b'<a href="/rel/1">y</a></body></html>',
            ),
            (
                "https://h.example.org/plain",
                datetime(2026, 8, 17, 12, 0, 6, tzinfo=timezone.utc),
                b"<html><body>no title no links</body></html>",
            ),
        ],
        "url string, warc_ts timestamp, html binary",
    )
    recs = render_wat(pages)
    # frames parse back through the generic record parser
    parsed = {
        r.url: r for r in parse_warc_records(recs).collect()
    }
    assert set(parsed) == {"https://h.example.org/a", "https://h.example.org/plain"}
    a = parsed["https://h.example.org/a"]
    assert a.warc_type == "metadata"
    assert a.content_length == len(a.payload.encode("utf-8"))
    env = json.loads(a.payload)["Envelope"]
    hm = env["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert hm["Title"] == 'T "q" \\ s'  # escapes survive a real JSON parse
    assert [l["url"] for l in hm["Links"]] == [
        "https://h.example.org/b", "/rel/1",
    ]  # document order
    assert env["WARC-Header-Metadata"] == {
        "WARC-Date": "2026-08-17T12:00:05Z",
        "WARC-Target-URI": "https://h.example.org/a",
        "WARC-Type": "response",
    }
    p = json.loads(parsed["https://h.example.org/plain"].payload)["Envelope"]
    phm = p["Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    assert phm == {"Links": [], "Title": ""}  # fixed-shape empty lanes
    # pure projection: no Python eval, no exchange
    plan = recs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
