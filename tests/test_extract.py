"""Byte-identity gate: engine UDF output == frozen oracle == fixture golden."""

from pyspark.sql import functions as F

from biothings_crawler_spark.fixtures import corpus
from biothings_crawler_spark.operators.extract import (
    extract_items_udf,
    extract_links_udf,
    page_text_col,
)
from biothings_crawler_spark.oracle.links import extract_links

N = 160  # covers every quirk (xxh64-mod-8) and every source slot


def _pages_with_parser(spark, n):
    rows = [
        dict(r, parser=corpus.parser_for_source(corpus.source_of(i)))
        for i, r in enumerate(corpus.gen_pages(n))
    ]
    return spark.createDataFrame(
        rows, schema=corpus.PAGES_SCHEMA + ", parser string"
    )


def test_engine_text_byte_identical_to_golden(spark):
    df = _pages_with_parser(spark, N)
    out = df.select(
        "url",
        "text",
        page_text_col(
            extract_items_udf(F.col("html"), F.col("url"), F.col("parser"))
        ).alias("engine_text"),
    ).collect()
    assert len(out) == N
    mismatches = [r["url"] for r in out if r["engine_text"] != r["text"]]
    assert mismatches == [], f"{len(mismatches)} byte mismatches: {mismatches[:5]}"


def test_engine_links_match_oracle(spark):
    df = _pages_with_parser(spark, N)
    out = df.select(
        "url", "html", extract_links_udf(F.col("html"), F.col("url")).alias("links")
    ).collect()
    for r in out:
        oracle = extract_links(bytes(r["html"]).decode("utf-8"), r["url"])
        assert list(r["links"]) == oracle, r["url"]


def test_no_batch_eval_python_in_plan(spark):
    """Input-hint mandate: Arrow-batched UDFs only, never row-at-a-time."""
    df = _pages_with_parser(spark, 8)
    plan = df.select(
        extract_items_udf(F.col("html"), F.col("url"), F.col("parser"))
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_html_to_text_literal(spark):
    from biothings_crawler_spark.operators.extract import html_to_text_col
    from pyspark.sql import functions as F

    html = (
        "<html><head><title>T</title><style>p {x}</style>"
        "<script>var a = '<p>not text</p>';</script></head>"
        "<body><!-- hidden --><h1>A &amp; B</h1>"
        "<p>one   two</p>\n\n\n\n<p>&amp;lt;kept&gt; &nbsp;&#39;q&quot;</p>"
        "<ul><li>i1</li><li>i2</li></ul><br>end</body></html>"
    )
    df = spark.createDataFrame([(1, html.encode())], "id long, html binary")
    out = df.select(html_to_text_col(F.col("html")).alias("t")).collect()[0]["t"]
    # script/style/comment gone; &amp;lt; stays literal '&lt;' (amp last);
    # block closers -> newlines, runs of 3+ newlines capped at 2
    # the </ul> tag becomes a space between the <li> and <br> newlines,
    # which tightens to a blank line — a paragraph break after the list
    assert out == "T\nA & B\none two\n\n&lt;kept> 'q\"\ni1\ni2\n\nend"


def test_html_to_text_plan_is_pure_projection(spark):
    from biothings_crawler_spark.operators.extract import html_to_text_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, b"<p>x</p>")], "id long, html binary")
    plan = (
        df.select(html_to_text_col(F.col("html")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_canonical_map_resolution_and_orders(spark):
    """rel=canonical extraction: both attribute orders, root-relative
    resolution onto the page's scheme+host, absolute kept verbatim,
    dir-relative/missing fall back to self; clusters count aliases."""
    from biothings_crawler_spark.operators.extract import (
        canonical_clusters,
        canonical_map,
    )

    rows = [
        ("https://a.com/x?print=1",
         '<html><head><link rel="canonical" href="/x"></head></html>'),
        ("https://a.com/x",
         '<html><head><link href="https://a.com/x" rel="canonical"></head></html>'),
        ("https://a.com/y", "<html><head></head><body>no hint</body></html>"),
        ("https://a.com/z",
         '<html><head><link rel="canonical" href="sub/page.html"></head></html>'),
        ("https://b.com/q",
         '<html><head><link rel="canonical" href="https://a.com/x"></head></html>'),
    ]
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary"
    )
    m = {r["url"]: r for r in canonical_map(df).collect()}
    assert m["https://a.com/x?print=1"]["canonical_url"] == "https://a.com/x"
    assert m["https://a.com/x"]["is_canonical"] is True
    assert m["https://a.com/y"]["canonical_url"] == "https://a.com/y"
    assert m["https://a.com/z"]["canonical_url"] == "https://a.com/z"  # dir-rel -> self
    assert m["https://b.com/q"]["canonical_url"] == "https://a.com/x"  # cross-host
    c = {r["canonical_url"]: r for r in canonical_clusters(df).collect()}
    x = c["https://a.com/x"]
    assert x["n_pages"] == 3 and x["n_aliases"] == 2
    assert x["has_canonical_page"] is True


def test_hreflang_map_and_reciprocity(spark):
    """hreflang extraction resolves like canonical_map; reciprocity
    flags edges whose target does not link back (the SEO-bug case)."""
    from biothings_crawler_spark.operators.extract import (
        hreflang_map,
        hreflang_reciprocity,
    )

    en = ('<link rel="alternate" hreflang="de" href="https://x.com/de/p">'
          '<link rel="alternate" hreflang="FR" href="/fr/p">'
          '<link rel="alternate" hreflang="es" href="mailto:no">')
    de = '<link rel="alternate" hreflang="en" href="https://x.com/p">'
    fr = "<p>no links back</p>"
    pages = spark.createDataFrame(
        [("https://x.com/p", en.encode()),
         ("https://x.com/de/p", de.encode()),
         ("https://x.com/fr/p", fr.encode())],
        "url string, html binary",
    )
    m = hreflang_map(pages)
    got = {(r["url"], r["lang"], r["target_url"]) for r in m.collect()}
    assert got == {
        ("https://x.com/p", "de", "https://x.com/de/p"),
        ("https://x.com/p", "fr", "https://x.com/fr/p"),   # lowered + resolved
        ("https://x.com/de/p", "en", "https://x.com/p"),
    }
    r = {(x["lang"]): x["is_reciprocal"] for x in hreflang_reciprocity(m).collect()
         if x["url"] == "https://x.com/p"}
    assert r == {"de": True, "fr": False}   # fr page never links back


def test_meta_robots_and_enforcement(spark):
    """Page-level REP: directive union across tags + header; 'none'
    implies both; enforcement drops noindex pages from the index and
    nofollow sources' edges from the link set."""
    import pyspark.sql.functions as F

    from biothings_crawler_spark.operators.extract import (
        enforce_meta_robots,
        meta_robots,
    )

    pages = spark.createDataFrame(
        [("a", b'<meta name="robots" content="noindex">', ""),
         ("b", b"<html>", "none"),
         ("c", b'<meta content="NOFOLLOW" name=robots>', ""),
         ("d", b"<html>", "noarchive")],
        "url string, html binary, x_robots_tag string")
    flagged = meta_robots(pages)
    got = {r.url: (r.noindex, r.nofollow) for r in flagged.collect()}
    assert got == {"a": (True, False), "b": (True, True),
                   "c": (False, True), "d": (False, False)}

    links = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"), ("d", "x")],
        "src string, dst string")
    indexable, followable = enforce_meta_robots(flagged, links)
    assert sorted(r.url for r in indexable.collect()) == ["c", "d"]
    assert sorted(r.src for r in followable.collect()) == ["a", "d"]
    p = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "EvalPython" not in p


def test_identifier_extraction_lanes(spark):
    from biothings_crawler_spark.operators.extract import (
        extract_identifiers,
    )

    pages = spark.createDataFrame(
        [
            (1, "cited as 10.1093/nar/gkx1098, see also "
                "GSE12345 text GSE12345 and GSM999"),
            (2, "runs SRR102030 ERR203040 DRR304050 done"),
            (3, "PDB 1abc and PDB:2xyz but not PDBX9999"),
            (4, "PMID: 12345678 PMID 99 PMID:7"),
            # near-misses: boundaries must reject all of these
            (5, "GSE12x SRR123 notGSE12345 10.12/short"),
        ],
        "doc_id long, text string",
    )
    rows = extract_identifiers(pages).collect()
    got = {}
    for r in rows:
        got.setdefault((r["id"], r["kind"]), []).append(
            (r["ident"], r["n_in_doc"]))
    assert got[(1, "doi")] == [("10.1093/nar/gkx1098,", 1)] or \
        got[(1, "doi")] == [("10.1093/nar/gkx1098", 1)]
    assert [x[0] for x in got[(1, "geo_series")]] == ["GSE12345"] * 2
    assert got[(1, "geo_series")][0][1] == 2        # mention count
    assert got[(1, "geo_sample")] == [("GSM999", 1)]
    assert sorted(x[0] for x in got[(2, "sra_run")]) == [
        "DRR304050", "ERR203040", "SRR102030"]
    assert sorted(x[0] for x in got[(3, "pdb")]) == ["1abc", "2xyz"]
    assert sorted(x[0] for x in got[(4, "pmid")]) == [
        "12345678", "7", "99"]
    # near-miss page yields nothing: SRR123 too short, GSE12x broken
    # boundary, notGSE12345 mid-word, 10.12/ too-short prefix
    assert not any(k[0] == 5 for k in got)
