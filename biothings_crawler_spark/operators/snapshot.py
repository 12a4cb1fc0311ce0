"""Crawl-snapshot diffing — the incremental-crawl bookkeeping step:
given two crawl rounds' page tables, classify every URL as added,
removed, changed, or unchanged (by content hash). Feeds the recrawl
scheduler (operators/recrawl) and the re-extract queue: only
added+changed pages re-enter the extraction pipeline, which at
10^10-page scale is the difference between re-processing the web and
re-processing the day's delta.

Shape: one full-outer equi-join on the canonical URL (the only
shuffle; both sides pre-bucketed by url at production scale makes it
co-located — see bucketing.py), then a row-local CASE. No windows, no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ADDED = "added"
REMOVED = "removed"
CHANGED = "changed"
UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
) -> DataFrame:
    """(url, status, old_hash, new_hash) for every URL in either
    snapshot: added (only in new), removed (only in old), changed
    (both, hashes differ), unchanged."""
    o = old.select(F.col(url_col).alias("url"), F.col(hash_col).alias("old_hash"))
    n = new.select(F.col(url_col).alias("url"), F.col(hash_col).alias("new_hash"))
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit(ADDED))
        .when(F.col("new_hash").isNull(), F.lit(REMOVED))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit(CHANGED))
        .otherwise(F.lit(UNCHANGED))
    )
    return j.select("url", status.alias("status"), "old_hash", "new_hash")


def refetch_queue(diff: DataFrame) -> DataFrame:
    """URLs the next round must (re)process: added + changed."""
    return diff.filter(F.col("status").isin(ADDED, CHANGED)).select("url", "status")


def latest_snapshot(
    df: DataFrame,
    url_col: str,
    us_col: str,
    tiebreak_col: str,
    payload_cols: tuple = (),
) -> DataFrame:
    """Common-Crawl ingest dedup: a crawl archive holds MANY fetch
    records per URL across crawls; keep exactly the newest one per URL
    — the step that turns raw WARC records into the one-row-per-URL
    pages table every downstream operator assumes.

    Shape: ONE aggregation taking max(struct(us, tiebreak, *payload))
    per url — lexicographic struct ordering picks the newest (largest
    epoch-us, then tiebreak), and the payload columns ride inside the
    struct so no join-back is needed. A struct-typed buffer plans as
    SortAggregate (not HashAggregate), but the property that matters
    at 10^10 fetch records is the MAP-SIDE PARTIAL MAX: a hot URL
    (fetched every crawl for years) collapses to one row per input
    partition BEFORE the shuffle, so the exchange carries ~|urls| rows
    — a row_number window would instead shuffle every fetch record to
    its url's partition and sort them all there.

    Returns (url, fetched_us, *payload_cols). ``us_col`` must already
    be integer epoch-microseconds (cross-engine exact by convention).
    """
    w = F.max(
        F.struct(F.col(us_col), F.col(tiebreak_col),
                 *[F.col(c) for c in payload_cols])
    ).alias("w")
    agg = df.groupBy(F.col(url_col).alias("url")).agg(w)
    return agg.select(
        "url",
        F.col(f"w.{us_col}").alias("fetched_us"),
        *[F.col(f"w.{c}").alias(c) for c in payload_cols],
    )


def url_history(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """SCD2-style content-version history from a raw fetch log:
    collapse each URL's time-ordered fetches into change intervals
    ``(url, version_no, content_hash, valid_from, valid_to,
    n_fetches)`` — ``valid_to`` is the next version's ``valid_from``
    (NULL for the live version).  The temporal complement of
    :func:`snapshot_diff`: diff answers "what changed between two
    crawls", history answers "when did each URL's content change,
    ever" — the table recrawl scheduling (operators/recrawl.py)
    estimates change rates from.

    Scale shape: ONE url-keyed hash aggregation (collect_list →
    array_sort → run-collapsing ``aggregate`` fold → indexed transform
    for valid_to → posexplode) — the bounded per-group pattern shared
    with packing/sessionize, sized by one URL's fetch count, never a
    corpus-wide window (this host's WindowExec degrades under
    concurrency; hash aggs don't — BASELINE.md round-3 controls).
    """
    src = df.select(
        F.col(url_col).alias("url"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(hash_col).alias("h")
        ).alias("x"),
    )
    fold = """aggregate(
      array_sort(xs),
      CAST(array() AS array<struct<h:string,vf:timestamp,n:bigint>>),
      (acc, x) -> IF(
        size(acc) > 0 AND element_at(acc, -1).h = x.h,
        concat(slice(acc, 1, size(acc) - 1),
               array(named_struct('h', x.h,
                                  'vf', element_at(acc, -1).vf,
                                  'n', element_at(acc, -1).n + 1))),
        concat(acc, array(named_struct('h', x.h, 'vf', x.ts,
                                       'n', CAST(1 AS bigint))))),
      acc -> transform(acc, (v, i) -> named_struct(
        'h', v.h, 'vf', v.vf, 'n', v.n,
        'vt', IF(i + 2 <= size(acc), element_at(acc, i + 2).vf,
                 CAST(NULL AS timestamp)))))"""
    packed = (
        src.groupBy("url")
        .agg(F.collect_list("x").alias("xs"))
        .select("url", F.posexplode(F.expr(fold)).alias("pos", "v"))
    )
    return packed.select(
        "url",
        (F.col("pos") + 1).cast("long").alias("version_no"),
        F.col("v.h").alias("content_hash"),
        F.col("v.vf").alias("valid_from"),
        F.col("v.vt").alias("valid_to"),
        F.col("v.n").alias("n_fetches"),
    )


def conditional_fetch_report(
    fetches: DataFrame,
    host_col: str,
    url_col: str,
    ts_col: str,
    hash_col: str,
    size_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Bandwidth accounting for conditional requests: per host,
    ``(host, n_fetches, n_refetches, n_unchanged, bytes_unchanged,
    waste_ppm)`` — every refetch whose content hash equals the
    previous fetch's is a body the crawler could have skipped with
    If-None-Match/If-Modified-Since (a 304 costs headers only), so
    ``bytes_unchanged`` is the recoverable bandwidth and ``waste_ppm``
    the fraction of refetch bytes wasted.  At 10^10 fetches this
    number decides whether the fetcher grows a conditional-request
    path at all; the reference never measures it (Scrapy refetches
    whole bodies unconditionally).

    Shape: one lag window over (url, ts) — same keyed exchange the
    recrawl scheduler already pays — then a host-keyed hash agg.
    Exact integers throughout.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(hash_col)).over(w)
    flagged = fetches.select(
        F.col(host_col).alias("host"),
        F.col(size_col).cast("long").alias("size"),
        prev.isNotNull().cast("int").alias("is_refetch"),
        (prev.isNotNull() & (F.col(hash_col) == prev)).cast("int").alias("unchanged"),
    )
    return flagged.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.sum("is_refetch").cast("long").alias("n_refetches"),
        F.sum("unchanged").cast("long").alias("n_unchanged"),
        F.sum(F.col("size") * F.col("unchanged")).cast("long").alias("bytes_unchanged"),
        F.expr(
            "CASE WHEN sum(size * is_refetch) = 0 THEN 0 "
            "ELSE sum(size * unchanged) * 1000000 div sum(size * is_refetch) END"
        ).cast("long").alias("waste_ppm"),
    )
