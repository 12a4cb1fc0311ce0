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
