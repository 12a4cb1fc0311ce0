"""Host-scoped boilerplate subtraction (operators/text) and IDN
homograph census (operators/homograph)."""

from biothings_crawler_spark.operators.homograph import homograph_groups
from biothings_crawler_spark.operators.text import host_boilerplate_strip


def _strip(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, host string, text string")
    return {r.id: r for r in
            host_boilerplate_strip(df, "id", "host", "text", **kw).collect()}


def test_host_footer_dies_syndicated_quote_survives(spark):
    """The footer is on 100% of each host's pages -> per-host chrome,
    dies.  The syndicated quote is on ONE page of each host (below
    the 80% share) -> survives on both, even though corpus-globally
    it appears on 2 documents — the semantics corpus-global line
    dedup cannot express."""
    rows = []
    for i in range(6):
        quote = "\nshared quote" if i == 0 else ""
        rows.append((i, "a", f"unique {i}{quote}\nfooter A"))
    for i in range(6, 10):
        quote = "\nshared quote" if i == 6 else ""
        rows.append((i, "b", f"unique {i}{quote}\nfooter B"))
    got = _strip(spark, rows)
    for i in range(10):
        t = got[i].clean_text
        assert "footer" not in t              # per-host chrome dies
        assert f"unique {i}" in t
        assert got[i].n_removed == 1
    assert "shared quote" in got[0].clean_text
    assert "shared quote" in got[6].clean_text


def test_share_threshold_and_min_pages(spark):
    # 'sometimes' on 2 of 4 pages (50% < 80%): kept; host c has only
    # 2 pages (< min_pages): its universal footer still kept
    rows = [
        (1, "a", "x1\ncommon"), (2, "a", "x2\ncommon"),
        (3, "a", "x3\nsometimes\ncommon"), (4, "a", "x4\nsometimes\ncommon"),
        (10, "c", "y1\nfoot"), (11, "c", "y2\nfoot"),
    ]
    got = _strip(spark, rows)
    assert "sometimes" in got[3].clean_text
    assert "common" not in got[1].clean_text   # 4/4 pages >= 80%
    assert "foot" in got[10].clean_text        # host below min_pages
    # internal repetition is not template evidence
    got2 = _strip(spark, [
        (1, "d", "rep\nrep\nrep\nu1"), (2, "d", "u2"), (3, "d", "u3"),
    ])
    assert got2[1].clean_text.count("rep") == 3


def test_order_preserved_and_empty_doc(spark):
    rows = [(1, "a", "z\na\nm"), (2, "a", "k"), (3, "a", "q"),
            (4, "a", None)]
    got = _strip(spark, rows)
    assert got[1].clean_text == "z\na\nm"
    # NULL text explodes to zero lines: empty output, nothing counted
    assert got[4].clean_text == "" and got[4].n_kept == 0
    assert got[4].n_removed == 0


def test_homograph_groups(spark):
    hosts = spark.createDataFrame(
        [("site.example.org",), ("sіte.example.org",),   # cyrillic і
         ("s0te.example.org",), ("other.example.org",),
         ("site.example.org",)],                          # dup row
        "host string")
    got = {r.host: (r.canonical, r.n_hosts)
           for r in homograph_groups(hosts).collect()}
    # s0te -> sote skeleton, NOT site: no collision for it
    assert set(got) == {"site.example.org", "sіte.example.org"}
    assert got["site.example.org"] == ("site.example.org", 2)
    assert got["sіte.example.org"][0] == "site.example.org"


def test_homograph_digit_fold(spark):
    hosts = spark.createDataFrame(
        [("google.com",), ("g0ogle.com",), ("goog1e.com",)],
        "host string")
    got = {r.host: r.n_hosts for r in homograph_groups(hosts).collect()}
    assert set(got) == {"google.com", "g0ogle.com", "goog1e.com"}
    assert all(n == 3 for n in got.values())


def test_nofollow_token_matching_not_substring(spark):
    """'nofollowed' as a rel token must NOT match the nofollow rule;
    token-boundary matching only."""
    from pyspark.sql import functions as F

    rows = [
        (1, '<a rel="nofollow" href="https://a/1">x</a>'),
        (2, '<a rel="nofollowed" href="https://a/2">x</a>'),
        (3, '<a rel="noopener nofollow" href="https://a/3">x</a>'),
        (4, '<a href="https://a/4" rel="sponsored">x</a>'),
        (5, '<a name="nohref">x</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    attrs = df.select(
        "doc_id",
        F.explode(F.expr(
            r"regexp_extract_all(html, '<a\\s+([^>]*)>', 1)")).alias("attr"))
    out = attrs.select(
        "doc_id",
        F.regexp_extract("attr", r'href="([^"]*)"', 1).alias("href"),
        F.regexp_extract("attr", r'rel="([^"]*)"', 1).alias("r"),
    ).filter(F.col("href") != "")
    cls = {r.doc_id: (
        "nofollow" if __import__("re").search(r"(^|\s)nofollow(\s|$)", r.r)
        else "other") for r in out.collect()}
    assert cls[1] == "nofollow" and cls[3] == "nofollow"
    assert cls[2] == "other" and cls[4] == "other"
    assert 5 not in cls
