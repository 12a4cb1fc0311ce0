"""DUST rule learning: detect content-irrelevant URL query parameters
("Do Not Crawl in the DUST: Different URLs with Similar Text",
Bar-Yossef et al. 2007) so URL canonicalization can strip them.

Session ids, tracking tags (``utm_*``), and cache-busters make one
page look like millions of URLs; at 10^10-frontier scale the seen-set
and dedup layers drown unless canonicalization strips them.  The
reference hard-codes its per-source URL surgery
(crawler/spiders/*: fixed id-extraction regexes); a generic crawler
must LEARN the strip rules from evidence.

Evidence model, per query parameter ``p``: group crawled URLs that
share the same *residual* URL (the URL with the ``p=value`` pair
removed, other parameters kept in order).  A residual group with >1
distinct value of ``p`` is an experiment: if every member fetched
byte-identical content, ``p`` provably didn't matter there.  A
parameter is stripped when ≥ ``min_support`` experiment groups exist
and ≥ ``strip_ppm`` of them are content-identical.  Parameters whose
value never varies within any group yield no experiments and are
conservatively kept.

Scale shape: one row-local parameter explode (bounded by params per
URL) → ONE (param, residual) hash aggregation with two
count-distincts (Expand, map-side partials — the detect_traps shape,
operators/traps.py) → ONE param-keyed aggregation over the
|params|-bounded group table.  No window, no join, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def dust_params(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "content_hash",
    min_support: int = 3,
    strip_ppm: int = 900_000,
) -> DataFrame:
    """Per query-parameter strip verdicts: ``(param, n_groups_multi,
    n_irrelevant, irrelevant_ppm, strip)``.

    The residual is built by removing every occurrence of the exact
    ``name=value`` pair (duplicate identical pairs are rare and
    removing all of them biases conservatively — the residual gets
    MORE specific, never less).
    """
    url = F.col(url_col)
    path = F.substring_index(url, "?", 1)
    qs = F.when(
        F.instr(url, "?") > 0, F.expr(f"substr({url_col}, instr({url_col}, '?') + 1)")
    ).otherwise(F.lit(""))
    params = F.when(qs != "", F.split(qs, "&")).otherwise(
        F.array().cast("array<string>")
    )
    pe = df.select(
        url.alias("_url"),
        F.col(content_col).alias("_content"),
        path.alias("_path"),
        params.alias("_params"),
        F.explode(params).alias("kv"),
    )
    residual = F.concat(
        F.col("_path"),
        F.lit("?"),
        F.array_join(
            F.filter(F.col("_params"), lambda x: x != F.col("kv")), "&"
        ),
    )
    groups = (
        pe.select(
            F.substring_index(F.col("kv"), "=", 1).alias("param"),
            residual.alias("residual"),
            "kv",
            "_content",
        )
        .groupBy("param", "residual")
        .agg(
            F.countDistinct("kv").alias("n_vals"),
            F.countDistinct("_content").alias("n_contents"),
        )
    )
    multi = F.sum(F.when(F.col("n_vals") > 1, 1).otherwise(0))
    irrel = F.sum(
        F.when((F.col("n_vals") > 1) & (F.col("n_contents") == 1), 1).otherwise(0)
    )
    out = groups.groupBy("param").agg(
        multi.cast("long").alias("n_groups_multi"),
        irrel.cast("long").alias("n_irrelevant"),
    )
    ppm = F.when(
        F.col("n_groups_multi") > 0,
        F.expr(f"n_irrelevant * {PPM} div n_groups_multi"),
    ).otherwise(F.lit(0))
    return out.select(
        "param",
        "n_groups_multi",
        "n_irrelevant",
        ppm.cast("long").alias("irrelevant_ppm"),
        (
            (F.col("n_groups_multi") >= F.lit(int(min_support)))
            & (ppm >= F.lit(int(strip_ppm)))
        ).alias("strip"),
    )


def strip_learned_params(
    df: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Apply learned strip rules: remove every ``name=value`` pair
    whose name is in the strip set, preserving the order of surviving
    parameters; a URL whose query empties loses the ``?``.

    ``rules`` is :func:`dust_params` output — |params|-bounded, so it
    collapses to a broadcast array literal via a 1-row cross join
    (no per-row shuffle of the URL side).
    """
    stripped = rules.filter("strip").agg(
        F.collect_set("param").alias("__strip_set")
    )
    url = F.col(url_col)
    path = F.substring_index(url, "?", 1)
    qs = F.expr(f"substr({url_col}, instr({url_col}, '?') + 1)")
    kept = F.filter(
        F.split(qs, "&"),
        lambda x: ~F.array_contains(
            F.coalesce(F.col("__strip_set"), F.array().cast("array<string>")),
            F.substring_index(x, "=", 1),
        ),
    )
    cleaned = F.when(F.instr(url, "?") == 0, url).otherwise(
        F.when(F.size(kept) > 0, F.concat(path, F.lit("?"), F.array_join(kept, "&")))
        .otherwise(path)
    )
    return (
        df.join(F.broadcast(stripped))
        .withColumn(url_col, cleaned)
        .drop("__strip_set")
    )


# generalization rules, applied in THIS order on the PATH (uuid before
# hex before digits: each later class would half-match the earlier)
_TPL_RULES = [
    (r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
     "<uuid>"),
    (r"[0-9a-f]{8,}", "<hex>"),
    (r"[0-9]+", "<d>"),
]


def url_path_templates(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """URL path-template census per host — the crawl-budget planner's
    structural view of a site: ``/article/88172/view`` and
    ``/article/93's`` sibling collapse to ``/article/<d>/view``, so a
    host's URL space reads as a handful of templates with counts
    instead of millions of opaque paths. The DUST plane
    (``dust_params``) learns which QUERY parameters are content-
    irrelevant; this is its PATH-shape sibling (id segments, hex
    session tokens, UUIDs generalized in a fixed rule order — uuid
    before hex before digits, each later class would half-match the
    earlier).

    Pure codegen regexp_replace chain + one (host, signature) hash
    agg + a rank window over the bounded per-host template census.

    Output: (host, signature, n_urls, share_ppm, rank).
    """
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1)
    path = F.regexp_extract(F.col(url_col), r"^https?://[^/]+([^?#]*)", 1)
    sig = F.when(path == "", F.lit("/")).otherwise(path)
    for rx, token in _TPL_RULES:
        sig = F.regexp_replace(sig, rx, token)
    from biothings_crawler_spark.operators.profile import (
        census_share_rank,
    )

    cells = df.select(host.alias("host"), sig.alias("signature")) \
        .groupBy("host", "signature") \
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    return census_share_rank(
        cells, ["host"], "n_urls", ["signature"]
    ).select("host", "signature", "n_urls", "share_ppm", "rank")
