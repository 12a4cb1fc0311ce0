"""Incremental cursor scans — the reference's resumable crawls.

Reference semantics being preserved (SURVEY.md §2.11):
  * figshare.py:77-129 — resume from ``_meta.published_date``; scan
    ordered by published_date asc; skip ``exists(id)``-seen ids;
    checkpoint the cursor each page; re-anchor after deep pagination.
  * harvard.py:86-135 — resume ``start`` offset from ``_meta.next_start``;
    skip seen; checkpoint each page.

Spark mapping: one *incremental round* is a batch job:

    new = hits.filter(published_date >= cursor)
              .join(seen, id, 'left_anti')
    next_cursor = max(published_date) over (old cursor ∪ new)

committed to the catalog's ``crawl_meta`` table (round, source, cursor)
— the Iceberg ``_meta`` analog. Re-running a round is idempotent: the
anti-join drops everything already ingested (the reference's re-run
behavior, figshare.py:104-106).

A Structured Streaming variant (``incremental_stream``) expresses the
same thing over a file stream with ``Trigger.AvailableNow`` semantics —
optional; the batch loop is the engine's contract (the reference is a
batch crawler).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biothings_crawler_spark.catalog import ParquetManifestCatalog

CRAWL_META_SCHEMA = "round int, source string, cursor string"


def incremental_round(
    hits: DataFrame,
    seen_ids: DataFrame | None,
    cursor: str | None,
    id_col: str = "id",
    watermark_col: str = "published_date",
) -> tuple[DataFrame, str | None]:
    """One cursor round: (new rows, next cursor). Deterministic.

    ``>=`` (not ``>``) mirrors figshare.py:88-92: the API is queried
    with ``published_since=last_seen`` inclusively and the seen-check
    dedups the boundary row.
    """
    scoped = hits if cursor is None else hits.filter(F.col(watermark_col) >= F.lit(cursor))
    if seen_ids is not None:
        scoped = scoped.join(seen_ids.select(id_col), id_col, "left_anti")
    row = scoped.agg(F.max(watermark_col).alias("m")).collect()[0]
    next_cursor = row["m"] if row["m"] is not None else cursor
    if next_cursor is not None:
        next_cursor = str(next_cursor)
    return scoped, next_cursor


def run_incremental(
    spark: SparkSession,
    hits: DataFrame,
    source: str,
    checkpoint_dir: str,
    id_col: str = "id",
    watermark_col: str = "published_date",
) -> DataFrame:
    """Resumable incremental ingest with catalog-checkpointed cursor +
    seen ids. Each invocation = one round; re-runs are idempotent."""
    cat = ParquetManifestCatalog(checkpoint_dir)
    last = cat.latest_round()
    cursor = None
    seen = None
    if last is not None:
        meta = cat.read(spark, "crawl_meta", last)
        row = meta.filter(F.col("source") == source).collect()
        cursor = row[0]["cursor"] if row else None
        seen = cat.read(spark, "ingested")
    rnd = 0 if last is None else last + 1
    new, next_cursor = incremental_round(hits, seen, cursor, id_col, watermark_col)
    meta_df = spark.createDataFrame(
        [(rnd, source, next_cursor)], CRAWL_META_SCHEMA
    )
    cat.commit(rnd, {"ingested": new, "crawl_meta": meta_df})
    return cat.read(spark, "ingested", rnd)


def incremental_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    watermark_col: str = "published_date",
    id_col: str = "id",
):
    """Structured Streaming variant: file-stream the hits directory,
    watermark on the cursor column, drop duplicate ids within the
    watermark. ``trigger(availableNow=True)`` processes the backlog and
    stops — the streaming analog of one incremental round."""
    return (
        spark.readStream.schema(schema)
        .parquet(path)
        .withWatermark(watermark_col, "1 day")
        .dropDuplicatesWithinWatermark([id_col])
    )
