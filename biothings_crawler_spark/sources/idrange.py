"""ID-range and ID-list seed generation.

Reference: NCBI GEO generates 137,890 URLs ``acc.cgi?acc=GSE{1..137890}``
(ncbi_geo.py:21-27); NYU generates IDs 10001-10387 (nyu.py:42-51);
Discovery prefixes hit ids (discovery.py:29-35).

Spark mapping: ``spark.range`` (a parallel, partitioned iterator — at
10^10 ids it is the frontier itself) + ``concat``. Entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def id_range_seeds(
    spark: SparkSession,
    source: str,
    prefix: str,
    start: int,
    end: int,
    parser: str = "jsonld",
    priority: int = 0,
    suffix: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Seeds for URL = prefix + id + suffix, id in [start, end]."""
    rng = (
        spark.range(start, end + 1, 1, num_partitions)
        if num_partitions
        else spark.range(start, end + 1)
    )
    url = F.concat(F.lit(prefix), F.col("id").cast("string"), F.lit(suffix))
    return rng.select(
        F.concat(F.lit(f"{source}:"), F.col("id").cast("string")).alias("seed_id"),
        url.alias("url"),
        F.lit(source).alias("source"),
        F.lit(parser).alias("parser"),
        F.lit(priority).alias("priority"),
    )


def geo_seeds(spark: SparkSession, end: int = 137_890) -> DataFrame:
    """The reference's exact GEO URL space (ncbi_geo.py:23-26)."""
    return id_range_seeds(
        spark,
        "ncbi_geo",
        "https://www.ncbi.nlm.nih.gov/geo/query/acc.cgi?acc=GSE",
        1,
        end,
        parser="geo_table",
    )


def id_list_seeds(
    ids: DataFrame,
    source: str,
    prefix: str,
    parser: str = "jsonld",
    priority: int = 0,
) -> DataFrame:
    """ID-list sources (immport.py:44-65, disprot.py:25-36): a search
    API's hit ids -> per-ID page URLs."""
    return ids.select(
        F.concat(F.lit(f"{source}:"), F.col("id").cast("string")).alias("seed_id"),
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url"),
        F.lit(source).alias("source"),
        F.lit(parser).alias("parser"),
        F.lit(priority).alias("priority"),
    )
