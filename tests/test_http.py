"""HTTP response-layer operators (operators/http): charset sniffing
and cache-policy TTLs."""

import pyspark.sql.functions as F

from biothings_crawler_spark.operators.http import cache_ttl, sniff_charset


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, html binary, content_type string")


def test_charset_precedence_and_aliases(spark):
    rows = [
        # BOM wins over everything
        (0, "﻿<meta charset='latin1'>".encode(),
         "text/html; charset=ascii"),
        (1, b"\xff\xfe\x00<", "text/html"),                   # UTF-16 LE BOM
        (2, b"\xfe\xff\x00<", "text/html"),                   # UTF-16 BE BOM
        # header beats meta; alias folds
        (3, b"<meta charset='Shift_JIS'>", "text/html; charset=Latin-1"),
        # meta (http-equiv form) when header silent
        (4, b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=utf8">', "text/html"),
        # nothing anywhere -> default
        (5, b"<html>plain</html>", None),
    ]
    out = {r.doc_id: (r.charset, r.charset_source)
           for r in sniff_charset(_pages(spark, rows)).collect()}
    assert out[0] == ("utf-8", "bom")
    assert out[1] == ("utf-16le", "bom")
    assert out[2] == ("utf-16be", "bom")
    assert out[3] == ("windows-1252", "header")
    assert out[4] == ("utf-8", "meta")
    assert out[5] == ("windows-1252", "default")


def test_charset_meta_outside_prescan_ignored(spark):
    """A meta tag past the prescan window is invisible — the spec's
    prescan reads only the first chunk, and so do we."""
    far = b"<html>" + b" " * 2000 + b"<meta charset='utf-8'>"
    out = sniff_charset(_pages(spark, [(0, far, "text/html")]),
                        prefix_bytes=1024).collect()[0]
    assert out.charset_source == "default"


def test_cache_ttl_directives(spark):
    rows = [
        (0, "max-age=3600", 0, 10_000_000),
        (1, "no-store", 0, 0),
        (2, "s-maxage=600, max-age=30", 100, 0),   # shared cache: 600-100
        (3, None, 0, 0),                            # default heuristic
        (4, "private, max-age=0, no-cache", 0, 0),
        (5, "max-age=100", 150, 5_000_000),         # age clamp to 0
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, cache_control string, age_s long, fetch_ts_us long")
    out = {r.doc_id: r for r in cache_ttl(df).collect()}
    assert out[0].ttl_s == 3600
    assert out[0].stale_at_us == 10_000_000 + 3600 * 1_000_000
    assert out[1].ttl_s == 0
    assert out[2].ttl_s == 500
    assert out[3].ttl_s == 86_400
    assert out[4].ttl_s == 0
    assert out[5].ttl_s == 0 and out[5].stale_at_us == 5_000_000


def test_http_ops_stay_jvm_side(spark):
    df = _pages(spark, [(0, b"<html>", "text/html")])
    plan = (
        cache_ttl(
            sniff_charset(df).withColumn("cache_control", F.lit("max-age=1"))
            .withColumn("age_s", F.lit(0))
            .withColumn("fetch_ts_us", F.lit(0).cast("long")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_clamp_with_cache_policy(spark):
    from biothings_crawler_spark.operators.recrawl import clamp_with_cache_policy

    sched = spark.createDataFrame(
        [("a", 2, 1, 3600, 1_000_000), ("b", 1, 0, 7200, 5_000_000),
         ("c", 1, 0, 7200, 5_000_000)],
        "url string, n_fetches long, n_changes long, interval_s long, "
        "next_due_us long")
    pol = spark.createDataFrame(
        [("a", 9_000_000), ("b", 1_000_000)], "url string, stale_at_us long")
    out = {r.url: r for r in clamp_with_cache_policy(sched, pol).collect()}
    assert out["a"].next_due_us == 9_000_000 and out["a"].was_clamped
    assert out["b"].next_due_us == 5_000_000 and not out["b"].was_clamped
    # unpoliced url passes through
    assert out["c"].next_due_us == 5_000_000 and not out["c"].was_clamped
    assert out["a"].interval_s == 3600  # model interval untouched


def test_sitemap_refetch_precedence(spark):
    from biothings_crawler_spark.sources.sitemap import sitemap_refetch

    entries = spark.createDataFrame(
        [("u1", "", 24), ("u2", "2024-06-01", 0), ("u3", "2024-01-01", 0),
         ("u4", "", 0), ("u5", "", 8760)],
        "loc string, lastmod string, recrawl_hours int")
    fetched = spark.createDataFrame(
        [("u2", "2024-05-10"), ("u3", "2024-05-10"), ("u4", "2024-05-10"),
         ("u5", "2026-08-16")],
        "loc string, last_fetch string")
    out = {r.loc: r for r in
           sitemap_refetch(entries, fetched, "2026-08-17").collect()}
    assert out["u1"].reason == "new" and out["u1"].refetch
    assert out["u2"].reason == "lastmod" and out["u2"].refetch
    # lastmod BEFORE last fetch + changefreq 'never': stays fresh
    assert out["u3"].reason == "fresh" and not out["u3"].refetch
    # no lastmod + 'never': heuristic suppressed
    assert out["u4"].reason == "fresh" and not out["u4"].refetch
    # yearly heuristic not yet elapsed (1 day < 8760h)
    assert out["u5"].reason == "fresh" and not out["u5"].refetch


def test_fetch_quality_binary_magics(spark):
    """PNG and gzip magics (bytes a DuckDB VARCHAR can't hold) are
    hex-detected; a real-HTML body is not a mismatch."""
    from biothings_crawler_spark.operators.http import fetch_quality

    rows = [
        (0, 200, "text/html", None, b"\x89PNG\r\n\x1a\n....."),
        (1, 200, "text/html", None, b"\x1f\x8b\x08\x00gz"),
        (2, 200, "text/html", None, b"<html>real</html>"),
        (3, 200, "image/png", None, b"\x89PNG\r\n\x1a\n"),  # declared right
        (4, 200, "text/html", None, b"PK\x03\x04zipzip"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, status int, content_type string, "
              "content_length long, body binary")
    out = {r.doc_id: r for r in fetch_quality(df).collect()}
    assert out[0].mime_mismatch and not out[0].ok
    assert out[1].mime_mismatch
    assert not out[2].mime_mismatch and out[2].ok
    assert not out[3].mime_mismatch and out[3].ok  # honest binary is fine
    assert out[4].mime_mismatch
    # null content_length: truncation unknown -> not flagged
    assert not out[2].truncated


def test_opengraph_absent_is_null(spark):
    from biothings_crawler_spark.operators.extract import opengraph

    df = spark.createDataFrame(
        [(b"<html><head><meta property='og:title' content='T'></head>",),
         (b"<html>no og</html>",)],
        "html binary")
    rows = opengraph(df).collect()
    got = {r.og_title for r in rows}
    assert got == {"T", None}
    assert all(r.twitter_card is None for r in rows)


def test_dechunk_framing_matrix(spark):
    from biothings_crawler_spark.operators.http import dechunk_col

    CRLF = "\r\n"

    def enc(*pieces, with_zero=True, ext="", trailer=""):
        out = ""
        for p in pieces:
            out += format(len(p), "x") + ext + CRLF + p + CRLF
        if with_zero:
            out += "0" + CRLF + trailer + CRLF
        return out

    cases = [
        ("two-chunk", enc("hello world, chu", "nked body!"),
         "hello world, chunked body!"),
        ("ext", enc("sixteen chars ok", ext=";x=1"), "sixteen chars ok"),
        ("empty", enc(), ""),
        ("trailer", enc("abc", trailer="X-T: 1\r\n"), "abc"),
        ("upperhex", "A" + CRLF + "0123456789" + CRLF + "0" + CRLF + CRLF,
         "0123456789"),
        ("bad-term", "10" + CRLF + "0123456789abcdefZZ" + "0" + CRLF + CRLF,
         None),
        ("truncated", "10" + CRLF + "0123456", None),
        ("no-zero", enc("abc", with_zero=False), None),
        ("garbage", "not chunked at all", None),
        ("emptybody", "", None),
        ("null", None, None),
        ("over-bound", enc(*["x"] * 30), None),    # 30 chunks > max 24
        ("at-bound-1", enc(*["y"] * 23), "y" * 23),  # 23 + zero = 24 steps
    ]
    df = spark.createDataFrame(
        [(n, b) for n, b, _ in cases], "name string, body string")
    got = {r["name"]: (r["d"]["ok"], r["d"]["text"]) for r in df.select(
        "name", dechunk_col(F.col("body")).alias("d")).collect()}
    for n, _b, exp in cases:
        assert got[n] == (exp is not None, exp), (n, got[n], exp)


def _crc32_bitloop(data: bytes) -> int:
    # independent CRC-32 (reflected 0xEDB88320) bit loop — no zlib
    c = 0xFFFFFFFF
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = (0xEDB88320 ^ (c >> 1)) if c & 1 else c >> 1
    return c ^ 0xFFFFFFFF


def test_gzip_hand_crafted_golden(spark):
    """A member assembled BY HAND from RFC 1952 + RFC 1951 stored-block
    framing (no encoder involved anywhere) must decode to 'hello'."""
    import struct
    import zlib

    data = b"hello"
    crc = _crc32_bitloop(data)
    assert crc == zlib.crc32(data) & 0xFFFFFFFF == 0x3610A686
    golden = (
        b"\x1f\x8b\x08\x00" + b"\x00\x00\x00\x00" + b"\x00\x03"
        + b"\x01" + struct.pack("<H", 5) + struct.pack("<H", 0xFFFA)
        + data + struct.pack("<I", crc) + struct.pack("<I", 5))

    from biothings_crawler_spark.operators.http import gunzip_report
    df = spark.createDataFrame([(1, bytearray(golden))],
                               "doc_id long, payload binary")
    r = gunzip_report(df, "doc_id", "payload").first()
    assert r["valid"] and r["text"] == "hello" and r["mtime"] == 0


def test_gzip_real_deflate_and_header_variants(spark):
    """The decoder must also handle REAL compressed members (dynamic
    huffman via zlib/gzip module) and the optional header fields
    (FEXTRA, FNAME, FCOMMENT, FHCRC together)."""
    import gzip as gzmod
    import struct
    import zlib

    from biothings_crawler_spark.operators.http import (
        gen_gzip_stored, gunzip_report)

    text = b"the quick brown fox " * 20
    real = gzmod.compress(text, compresslevel=9, mtime=7)

    # all-flags member: FTEXT|FHCRC|FEXTRA|FNAME|FCOMMENT
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    deflate = co.compress(text) + co.flush()
    hdr = bytearray(b"\x1f\x8b\x08")
    hdr.append(0x01 | 0x02 | 0x04 | 0x08 | 0x10)
    hdr += struct.pack("<I", 42) + b"\x00\x03"
    hdr += struct.pack("<H", 4) + b"XTRA"          # FEXTRA
    hdr += b"name.txt\x00"                          # FNAME
    hdr += b"a comment\x00"                         # FCOMMENT
    hdr += struct.pack("<H", zlib.crc32(bytes(hdr)) & 0xFFFF)  # FHCRC
    allflags = (bytes(hdr) + deflate
                + struct.pack("<I", zlib.crc32(text) & 0xFFFFFFFF)
                + struct.pack("<I", len(text) & 0xFFFFFFFF))

    stored = gen_gzip_stored(text, fname="s.txt", mtime=9, block=64)
    assert _crc32_bitloop(text) == zlib.crc32(text) & 0xFFFFFFFF

    df = spark.createDataFrame(
        [(1, bytearray(real)), (2, bytearray(allflags)),
         (3, bytearray(stored))],
        "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in
            gunzip_report(df, "doc_id", "payload").collect()}
    want = text.decode()
    assert rows[1]["valid"] and rows[1]["text"] == want
    assert rows[1]["mtime"] == 7
    assert rows[2]["valid"] and rows[2]["text"] == want
    assert rows[2]["fname"] == "name.txt"
    assert rows[3]["valid"] and rows[3]["text"] == want
    assert rows[3]["fname"] == "s.txt" and rows[3]["mtime"] == 9
