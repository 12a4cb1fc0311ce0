"""Canonicalizer: pure-Python oracle == native-Spark twin, byte-for-byte."""

from hypothesis import given, settings, strategies as st

from biothings_crawler_spark.urlnorm import (
    canonicalize_col,
    canonicalize_url,
    domain_key,
    domain_key_col,
    host_col,
    host_of,
)

CASES = [
    "https://zenodo.example.org/record/42",
    "HTTPS://ZeNoDo.Example.ORG/record/42",
    "http://a.example.org:80/x",
    "https://a.example.org:443/x",
    "https://a.example.org:8443/x",
    "http://a.example.org:8080/x",
    "https://geo.example.org/geo/query/acc.cgi?acc=GSE9&b=2&a=1",
    "https://geo.example.org/geo/query/acc.cgi?b=2&a=1&acc=GSE9",
    "https://h.example.org",
    "https://h.example.org/#frag",
    "https://h.example.org/p?z=1&y=&x=3#frag",
    "https://h.example.org/p?dup=1&dup=1&aa",
    "ftp://files.example.org/x",
    "not a url",
    "/relative/only",
]


def test_python_vs_spark_canonicalizer(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    rows = df.select(
        "url",
        canonicalize_col(df.url).alias("canon"),
        host_col(df.url).alias("host"),
    ).collect()
    for r in rows:
        assert r["canon"] == canonicalize_url(r["url"]), r["url"]
        assert r["host"] == host_of(r["url"]), r["url"]


def test_canonicalize_semantics():
    assert canonicalize_url("HTTP://A.Org:80/x?b=2&a=1#f") == "http://a.org/x?a=1&b=2"
    assert canonicalize_url("https://a.org") == "https://a.org/"
    # same canonical form -> same seen-set key
    assert canonicalize_url(CASES[6]) == canonicalize_url(CASES[7])
    assert canonicalize_url("nope") is None


def test_canonicalize_idempotent_on_cases():
    for u in CASES:
        c = canonicalize_url(u)
        if c is not None:
            assert canonicalize_url(c) == c, u


@settings(max_examples=300, deadline=None)
@given(
    st.builds(
        lambda scheme, host, port, path, q: f"{scheme}://{host}{port}{path}{q}",
        st.sampled_from(["http", "https", "HTTP", "Https"]),
        st.from_regex(r"[a-zA-Z0-9.-]{1,20}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.from_regex(r"(/[a-zA-Z0-9._~-]{0,10}){0,3}", fullmatch=True),
        st.sampled_from(["", "?a=1", "?b=2&a=1", "?x", "?b=2&a=1&a=0"]),
    )
)
def test_canonicalize_idempotent_property(url):
    c = canonicalize_url(url)
    assert c is not None
    assert canonicalize_url(c) == c


def test_domain_key_quirk(spark):
    # the reference's lstrip('www.') char-set quirk (clic.py:100)
    assert domain_key("www.example.org") == "example.org"
    assert domain_key("ww2.example.org") == "2.example.org"
    assert domain_key("web.example.org") == "eb.example.org"
    df = spark.createDataFrame(
        [("www.example.org",), ("ww2.example.org",), ("web.example.org",)], "h string"
    )
    for r in df.select("h", domain_key_col(df.h).alias("k")).collect():
        assert r["k"] == domain_key(r["h"])


def test_surt_key_edges(spark):
    """SURT keys: label reversal, www strip, port drop, empty path ->
    '/', query kept as-is, non-URL -> null; prefix helper owns the
    whole subdomain range."""
    from pyspark.sql import functions as F

    from biothings_crawler_spark.urlnorm import surt_key_col, surt_prefix

    rows = [
        ("https://www.news.example.org/a/b?x=1", "org,example,news)/a/b?x=1"),
        ("http://Example.org:8080/p", "org,example)/p"),
        ("https://example.org", "org,example)/"),
        ("https://a.b.c.example.org/z", "org,example,c,b,a)/z"),
        ("ftp://files.example.org/f", "org,example,files)/f"),
        ("no scheme here", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r["s"] for r in df.select(
        surt_key_col(F.col("url")).alias("s")).collect()]
    assert got == [s for _, s in rows]
    assert surt_prefix("example.org") == "org,example"
    assert surt_prefix("www.example.org") == "org,example"
    # every host's pages fall under its prefix -> contiguous range scan
    assert all(s.startswith("org,example") for s in got[:4] if s)


def test_etld1_psl_rule(spark):
    import pyspark.sql.functions as F

    from biothings_crawler_spark.urlnorm import etld1_col

    cases = {
        "www.news.example.co.uk": "example.co.uk",
        "example.co.uk": "example.co.uk",
        "foo.com": "foo.com",
        "a.b.c.foo.com": "foo.com",
        "deep.sub.x.ac.jp": "x.ac.jp",
        "co.uk": None,          # a bare public suffix registers nothing
        "localhost": None,      # single label
        "blog.example.org": "example.org",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {r.host: r.etld1
           for r in df.select("host", etld1_col(F.col("host")).alias("etld1"))
           .collect()}
    assert got == cases


def test_pct_normalize_rfc3986(spark):
    import pyspark.sql.functions as F

    from biothings_crawler_spark.urlnorm import pct_normalize_col

    cases = {
        "https://h/a%2Fb?x=%41%42": "https://h/a%2Fb?x=AB",  # reserved kept
        "https://h/%7etilde%3a": "https://h/~tilde%3A",      # case both ways
        "%2d%2e%5f%7e": "-._~",                              # all unreserved marks
        "plain": "plain",
        "100%": "100%",                                      # bare %
        "x%4": "x%4",                                        # partial escape
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.n for r in
           df.select("url", pct_normalize_col(F.col("url")).alias("n"))
           .collect()}
    assert got == cases
