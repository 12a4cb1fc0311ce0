"""Table-maintenance planning over file manifests: small-file
compaction grouping for an Iceberg-style layout.

A 10^10-URL crawl writing per-round checkpoints (plans/crawl.py,
catalog.py) accretes small files fast — every round's frontier/docs
commit adds one file per shuffle partition.  Compaction is the
maintenance job that rewrites many small files into target-size ones;
the PLANNER here decides the rewrite groups, and is itself a Spark job
over the manifest table (file path, partition, size), which at
warehouse scale is millions of rows — trivially distributable, but the
grouping must be deterministic so a re-run plans identical rewrites
(idempotent maintenance, same reasoning as the crawl checkpoints'
identical-resume contract).

Grouping contract (deterministic, window-expressible, both engines):
within each table partition, files already >= ``target_bytes`` are
KEPT as-is; the rest are ordered by (size DESC, file_id) and packed by
running-sum boundary — group ``floor((cum - size) / target)``.  Bins
can overshoot the target by at most one file (boundary-straddling),
which is what Iceberg's own bin-packing rewriter accepts too; ordering
big-first keeps overshoot small without the sequential state a true
first-fit-decreasing would need (FFD is inherently serial per
partition — wrong shape for a distributed planner, and its ~11/9 OPT
bound buys nothing over boundary-packing at these group sizes).

Plan shape: ONE exchange on the partition column; the running-sum
window, the per-group aggregate window (a refinement of the same
clustering — satisfied without a second exchange, only a sort), and
the union with the kept-files branch all ride it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["compaction_plan"]


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "part",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
) -> DataFrame:
    """One row per manifest file: ``(part, file_id, size_bytes, action
    'keep'|'compact', group_no, group_bytes, group_files)``.  ``keep``
    rows carry a NULL group (they are not rewritten); ``compact`` rows
    in the same (part, group_no) are rewritten together."""
    t = int(target_bytes)
    small = files.filter(F.col(size_col) < t)
    big = files.filter(F.col(size_col) >= t)

    w = Window.partitionBy(partition_col).orderBy(
        F.desc(size_col), file_col
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = small.withColumn("_cum", F.sum(size_col).over(w))
    grouped = cum.withColumn(
        "group_no", F.floor((F.col("_cum") - F.col(size_col)) / t)
    )
    gw = Window.partitionBy(partition_col, "group_no")
    planned = grouped.select(
        partition_col,
        file_col,
        size_col,
        F.lit("compact").alias("action"),
        F.col("group_no").cast("long"),
        F.sum(size_col).over(gw).cast("long").alias("group_bytes"),
        F.count(F.lit(1)).over(gw).cast("long").alias("group_files"),
    )
    kept = big.select(
        partition_col,
        file_col,
        size_col,
        F.lit("keep").alias("action"),
        F.lit(None).cast("long").alias("group_no"),
        F.col(size_col).cast("long").alias("group_bytes"),
        F.lit(1).cast("long").alias("group_files"),
    )
    return planned.unionByName(kept)
