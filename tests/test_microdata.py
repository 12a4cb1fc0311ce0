"""Schema.org microdata parser (operators/microdata)."""

from biothings_crawler_spark.operators.microdata import (
    _parse_microdata,
    microdata_extract,
)


def test_value_sources_and_nesting():
    html = (
        '<div itemscope itemtype="https://s.org/Dataset">'
        '<h1 itemprop="name">A &amp; B</h1>'
        '<meta itemprop="id" content="x1">'
        '<a itemprop="url" href="/d/1">txt</a>'
        '<img itemprop="image" src="/i.png">'
        '<time itemprop="date" datetime="2024-01-01">Jan 1</time>'
        '<div itemprop="creator" itemscope itemtype="https://s.org/Person">'
        '<span itemprop="name">P</span></div>'
        "</div>"
    )
    rows = _parse_microdata(html)
    assert (0, "https://s.org/Dataset", None, None, "name", "A & B") in rows
    assert (0, "https://s.org/Dataset", None, None, "id", "x1") in rows
    assert (0, "https://s.org/Dataset", None, None, "url", "/d/1") in rows
    assert (0, "https://s.org/Dataset", None, None, "image", "/i.png") in rows
    assert (0, "https://s.org/Dataset", None, None, "date", "2024-01-01") in rows
    assert (1, "https://s.org/Person", 0, "creator", "name", "P") in rows


def test_orphan_prop_ignored_and_multitoken():
    html = (
        '<p itemprop="orphan">zzz</p>'
        '<div itemscope itemtype="t">'
        '<span itemprop="a b">v</span></div>'
    )
    rows = _parse_microdata(html)
    assert all(r[4] != "orphan" for r in rows)
    assert (0, "t", None, None, "a", "v") in rows
    assert (0, "t", None, None, "b", "v") in rows


def test_self_closed_meta_and_quote_styles():
    html = (
        "<div itemtype='t' itemscope>"
        '<meta itemprop="m" content="c"/>'
        "<span itemprop='s'>  spaced  text </span></div>"
    )
    rows = _parse_microdata(html)
    assert (0, "t", None, None, "m", "c") in rows
    assert (0, "t", None, None, "s", "  spaced  text ") in rows


def test_scope_closes_properly():
    html = (
        '<div itemscope itemtype="t1"><span itemprop="x">1</span></div>'
        '<p itemprop="after">not in scope</p>'
        '<div itemscope itemtype="t2"><span itemprop="y">2</span></div>'
    )
    rows = _parse_microdata(html)
    assert (0, "t1", None, None, "x", "1") in rows
    assert (1, "t2", None, None, "y", "2") in rows
    assert len(rows) == 2


def test_spark_wrapper(spark):
    pages = spark.createDataFrame(
        [(1, '<div itemscope itemtype="t"><b itemprop="p">v</b></div>'),
         (2, "<p>no items</p>")],
        "id long, html string")
    got = [tuple(r) for r in microdata_extract(pages).collect()]
    assert got == [(1, 0, "t", None, None, "p", "v")]
