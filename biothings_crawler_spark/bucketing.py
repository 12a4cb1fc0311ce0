"""Bucketed tables for co-located joins — the shuffle-free fetch path.

At 10^10 frontier rows the crawl's recurring big-big join is
``frontier |><| pages ON url_canon/url_hash`` (plans/crawl.py fetch
step), re-run every round. Both sides bucketed by the SAME key into the
SAME bucket count lets Spark's bucketed scan satisfy the join's
distribution requirement from the table layout itself: SortMergeJoin
with ZERO Exchange on either side (pytest asserts it). The pages table
is written bucketed once at ingest; the frontier checkpoint reuses the
same bucket spec, so every round's fetch join reuses a partitioning
paid for once — the "bucketing for co-located joins" scale lever.

``bucketBy`` requires ``saveAsTable`` (the bucket spec lives in the
catalog, not the parquet footer); pass ``path`` to keep the data
external and the catalog entry a pointer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` bucketed+sorted by ``key`` as catalog table
    ``table`` (external at ``path`` when given)."""
    w = df.write.mode(mode).bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (spark.table keeps the bucket spec; a bare
    spark.read.parquet(path) would NOT — the spec lives in the
    catalog)."""
    return spark.table(table)
