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
