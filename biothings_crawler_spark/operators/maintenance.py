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


def erasure_impact(
    docs: DataFrame,
    erased: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Right-to-be-forgotten impact census: BEFORE executing an
    erasure batch, report exactly what each deletion touches across
    the engine's derived artifacts — the plan a compliance run signs
    off on.  A 100-TB corpus cannot "just delete the row": the doc's
    postings live in the inverted index, it may be the elected
    representative of an exact-dup cluster (its duplicates silently
    resurface content unless the cluster is re-elected), and its
    release-manifest bucket digest goes stale.

    Per erased id:

    * ``n_index_rows``  — postings rows to delete (distinct terms).
    * ``group_size``    — size of its exact-dup text cluster.
    * ``was_winner``    — 1 if it is the cluster's elected
      representative (min id, the dedup plane's rule).
    * ``new_winner``    — the re-elected representative among
      SURVIVORS (NULL when the whole cluster is erased — the content
      genuinely leaves the corpus).
    * ``bucket``        — md5 id-bucket whose manifest digest must be
      recomputed (matches the release-manifest bucketing discipline:
      id-only, layout-invariant).

    Shape: erased set broadcast-joined onto docs, one text-keyed hash
    agg for cluster stats, one for survivor re-election, row-local
    term counting — no windows, nothing quadratic in corpus size.
    """
    e = F.broadcast(erased.select(F.col(id_col).alias("id"))
                    .withColumn("_erased", F.lit(1)))
    from biothings_crawler_spark.operators.text import words_col

    # NULL text must not cluster: groupBy treats NULLs as equal, which
    # would fabricate duplicate relationships between unrelated empty
    # docs (review finding) -- key NULL-text docs by their own id so
    # they are singletons with zero postings
    text_key = F.when(
        F.col(text_col).isNotNull(), F.col(text_col)
    ).otherwise(F.concat(F.lit("\x01null:"),
                         F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col).alias("id"),
        text_key.alias("text"),
        F.coalesce(
            F.size(F.array_distinct(words_col(F.col(text_col)))),
            F.lit(0),
        ).cast("long").alias("n_index_rows"),
    ).join(e, "id", "left").withColumn(
        "_erased", F.coalesce("_erased", F.lit(0)))
    groups = base.groupBy("text").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min("id").alias("_winner"),
        F.min(F.when(F.col("_erased") == 0, F.col("id")))
        .alias("_surv_winner"),
    )
    out = base.filter(F.col("_erased") == 1).join(groups, "text")
    bucket = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
               16, 10).cast("long") % n_buckets
    )
    return out.select(
        "id", "n_index_rows", "group_size",
        (F.col("id") == F.col("_winner")).cast("long")
        .alias("was_winner"),
        F.when(F.col("id") == F.col("_winner"), F.col("_surv_winner"))
        .alias("new_winner"),
        bucket.alias("bucket"),
    )
