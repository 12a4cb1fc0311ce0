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
