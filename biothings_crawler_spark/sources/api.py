"""Paginated-API seed expansion (zenodo_covid / harvard style).

Reference behavior (SURVEY.md §2.1):
  * zenodo_covid.py:32-68 — GET records page by page (size=1000); per
    hit, fetch ``hit.links.doi``; hits with a missing link become error
    docs ``{"_type": "error", "_document": hit}`` (:48-51); follow
    ``links.next`` until absent.
  * harvard.py:46-71 — search API, page step 10; per item fetch
    ``item.url``; stop when a page has < 10 items.

Spark mapping: API responses are rows of the ``api_pages`` fixture
table (source, page_no, cursor, hits:array<struct>, next_cursor);
"follow next until absent" collapses to a scan of the source's pages —
the chain is materialized, recursion is unnecessary. Per-hit routing is
an ``explode`` + ``when``: good hits -> seeds, missing-link hits ->
the errors table. All native expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ERROR_DOC_SCHEMA_DOC = """errors rows mirror zenodo_covid.py:48-51:
(_type='error', _document=canonical JSON of the hit, source, page_no)"""


def expand_api_pages(api_pages: DataFrame, source: str) -> tuple[DataFrame, DataFrame]:
    """-> (seeds, errors) for one API source."""
    hits = (
        api_pages.filter(F.col("source") == source)
        .select("source", "page_no", F.explode("hits").alias("hit"))
    )
    good = hits.filter(~F.col("hit.missing_link"))
    seeds = good.select(
        F.concat(F.lit(f"{source}:"), F.col("hit.id")).alias("seed_id"),
        F.col("hit.url").alias("url"),
        "source",
        F.lit("jsonld").alias("parser"),
        F.lit(0).alias("priority"),
    )
    errors = hits.filter(F.col("hit.missing_link")).select(
        F.lit("error").alias("_type"),
        F.to_json(F.col("hit")).alias("_document"),
        "source",
        "page_no",
    )
    return seeds, errors


def stop_at_short_page(api_pages: DataFrame, source: str, page_size: int) -> DataFrame:
    """harvard.py:63-71: pages after the first short page (<page_size
    hits) are never requested. Window over page_no: keep pages up to
    and including the first short one."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("page_no")
    sized = api_pages.filter(F.col("source") == source).withColumn(
        "n_hits", F.size("hits")
    )
    # first short page per source
    short = sized.filter(F.col("n_hits") < page_size).groupBy("source").agg(
        F.min("page_no").alias("first_short")
    )
    return (
        sized.join(F.broadcast(short), "source", "left")
        .filter(F.col("first_short").isNull() | (F.col("page_no") <= F.col("first_short")))
        .drop("n_hits", "first_short")
    )
