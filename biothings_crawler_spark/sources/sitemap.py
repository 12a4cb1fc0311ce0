"""Sitemap seed expansion (reference SitemapSpider analog).

The reference's sitemap sources (zenodo.py:14-18, omicsdi.py:24-33,
massbank.py:6-13) let Scrapy's SitemapSpider (a) start from sitemap
URLs — or from robots.txt ``Sitemap:`` directives (massbank), (b)
recursively expand sitemap *indexes*, (c) keep only leaf ``<loc>`` URLs
whose path matches a ``sitemap_rules`` regex, routing them to a
callback.

Spark mapping: the sitemaps corpus is a table
(sitemap_url, host, is_index, child_sitemaps, loc_urls, lastmod); index
recursion is an iterative self-join to fixpoint (sitemap trees are
shallow — depth ≤ 2 in the wild and in the fixture — so the loop runs
2-3 small joins, each broadcastable); rule filtering is a native
``rlike``. No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seed_sitemap_urls(robots: DataFrame, explicit: DataFrame | None = None) -> DataFrame:
    """Union robots.txt Sitemap: directives with explicit sitemap seeds.

    massbank seeds its crawl from robots.txt (massbank.py:10); zenodo
    lists the sitemap directly (zenodo.py:17).
    """
    from_robots = robots.select(
        F.explode("sitemap_urls").alias("sitemap_url")
    )
    if explicit is not None:
        from_robots = from_robots.unionByName(explicit.select("sitemap_url"))
    return from_robots.distinct()


def expand_sitemaps(
    sitemaps: DataFrame, start: DataFrame, max_depth: int = 8
) -> DataFrame:
    """Recursively expand sitemap indexes from *start* to leaf page URLs.

    Iterative self-join until fixpoint: frontier of sitemap URLs ->
    join the sitemaps table -> leaves contribute loc_urls, indexes
    contribute child sitemaps for the next iteration. Determinism: set
    semantics (distinct) at every step.
    """
    frontier = start.select("sitemap_url").distinct()
    seen = frontier
    loc_urls = None
    for _ in range(max_depth):
        hit = frontier.join(sitemaps, "sitemap_url")
        leaves = hit.filter(~F.col("is_index")).select(
            F.explode("loc_urls").alias("url")
        )
        loc_urls = leaves if loc_urls is None else loc_urls.unionByName(leaves)
        children = (
            hit.filter(F.col("is_index"))
            .select(F.explode("child_sitemaps").alias("sitemap_url"))
            .distinct()
        )
        frontier = children.join(seen, "sitemap_url", "left_anti")
        if not frontier.head(1):
            break
        seen = seen.unionByName(frontier).distinct()
    return loc_urls.distinct() if loc_urls is not None else loc_urls


def sitemap_seeds(
    sitemaps: DataFrame,
    robots: DataFrame,
    source: str,
    host: str,
    rule: str,
    parser: str,
    priority: int = 0,
) -> DataFrame:
    """Full sitemap source: robots+explicit sitemaps -> leaf URLs ->
    sitemap_rules regex filter -> seed rows (SURVEY §2.1 rows 1-3)."""
    start = sitemaps.filter(F.col("host") == host).select("sitemap_url")
    start = seed_sitemap_urls(robots.filter(F.col("host") == host), start)
    urls = expand_sitemaps(sitemaps, start)
    if urls is None:
        return None
    return (
        urls.filter(F.col("url").rlike(rule))
        .select(
            F.concat(F.lit(f"{source}:sitemap:"), F.col("url")).alias("seed_id"),
            "url",
            F.lit(source).alias("source"),
            F.lit(parser).alias("parser"),
            F.lit(priority).alias("priority"),
        )
    )


# changefreq -> recrawl interval (hours); absent/unknown -> weekly.
CHANGEFREQ_HOURS = {
    "always": 1, "hourly": 1, "daily": 24, "weekly": 168,
    "monthly": 720, "yearly": 8760, "never": 0,
}
DEFAULT_PRIORITY_MILLI = 500  # sitemaps.org: priority defaults to 0.5


def parse_sitemap_xml(
    df: DataFrame, url_col: str = "sitemap_url", body_col: str = "body"
) -> DataFrame:
    """Parse raw sitemap XML bodies into per-URL scheduling rows:
    ``(sitemap_url, loc, lastmod, changefreq, priority_milli,
    recrawl_hours)`` — the metadata the reference leaves to Scrapy's
    SitemapSpider internals, lifted into a columnar operator so
    lastmod/changefreq/priority can drive recrawl scheduling
    (operators/recrawl.py) and frontier priority at 10^10 scale.

    Whole parse is regex over ``<url>…</url>`` blocks — ``(?s)`` so
    blocks may span lines, non-greedy, RE2-safe (the DuckDB oracle
    runs the identical patterns).  ``priority`` is parsed by integer
    string surgery into exact milli-units (``0.8`` → 800; absent →
    500), never via float.  Scale shape: one row-local extract +
    explode + row-local field extracts — zero exchanges, no Python.
    """
    blocks = F.expr(
        f"regexp_extract_all({body_col}, '(?s)<url>(.*?)</url>', 1)"
    )
    pe = df.select(F.col(url_col).alias("sitemap_url"), F.explode(blocks).alias("b"))
    field = lambda tag: F.regexp_extract(  # noqa: E731
        F.col("b"), f"(?s)<{tag}>\\s*(.*?)\\s*</{tag}>", 1
    )
    pr = field("priority")
    int_part = F.substring_index(pr, ".", 1)
    # fractional milli-digits: text after the dot, right-padded to 3
    frac_digits = F.when(
        F.instr(pr, ".") > 0,
        F.substring(
            F.rpad(F.substring_index(pr, ".", -1), 3, "0"), 1, 3
        ).cast("int"),
    ).otherwise(F.lit(0))
    priority_milli = F.when(pr == "", F.lit(DEFAULT_PRIORITY_MILLI)).otherwise(
        F.when(int_part == "", F.lit(0)).otherwise(int_part.cast("int")) * 1000
        + frac_digits
    )
    cf = F.lower(field("changefreq"))
    mapping = F.create_map(
        *[F.lit(x) for kv in CHANGEFREQ_HOURS.items() for x in kv]
    )
    recrawl_hours = F.coalesce(
        mapping[cf], F.lit(CHANGEFREQ_HOURS["weekly"])
    )
    return pe.select(
        "sitemap_url",
        field("loc").alias("loc"),
        field("lastmod").alias("lastmod"),
        cf.alias("changefreq"),
        priority_milli.cast("int").alias("priority_milli"),
        recrawl_hours.cast("int").alias("recrawl_hours"),
    ).filter(F.col("loc") != "")


def sitemap_refetch(
    entries: DataFrame,
    fetched: DataFrame,
    now_date: str,
    loc_col: str = "loc",
) -> DataFrame:
    """Sitemap-driven refetch queue — the incremental-crawl decision
    the sitemaps protocol exists to enable: for each advertised URL,
    refetch when it is NEW (never fetched), when ``lastmod`` moved
    past our last fetch (publisher-declared staleness), or when the
    ``changefreq`` heuristic interval has elapsed; ``never`` suppresses
    the heuristic path (only lastmod can re-trigger).

    ``fetched`` is ``(loc, last_fetch)`` with ISO ``YYYY-MM-DD`` dates
    — lastmod comparison is lexicographic on the ISO strings (exact,
    engine-independent); the age heuristic is integer day arithmetic.
    Adds ``last_fetch``, ``reason`` (``new`` / ``lastmod`` / ``age`` /
    ``fresh``) and ``refetch``.  One left equi-join on loc (bucketable
    on the same key as the seen-set), then row-local CASE — the
    decision column feeds frontier admission directly.
    """
    f = fetched.select(F.col(loc_col).alias("__loc"), F.col("last_fetch"))
    j = entries.join(f, entries[loc_col] == F.col("__loc"), "left")
    age_h = (
        F.datediff(F.lit(now_date).cast("date"),
                   F.col("last_fetch").cast("date")) * 24
    )
    reason = (
        F.when(F.col("last_fetch").isNull(), F.lit("new"))
        .when((F.col("lastmod") != "")
              & (F.col("lastmod") > F.col("last_fetch")), F.lit("lastmod"))
        .when((F.col("recrawl_hours") > 0)
              & (age_h >= F.col("recrawl_hours")), F.lit("age"))
        .otherwise(F.lit("fresh"))
    )
    return (
        j.select(*[F.col(c) for c in entries.columns], "last_fetch",
                 reason.alias("reason"))
        .withColumn("refetch", F.col("reason") != "fresh")
    )


def _xml_escape(c: F.Column) -> F.Column:
    # the five XML predefined entities, ampersand FIRST (it appears in
    # every later replacement's output)
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                     ('"', "&quot;"), ("'", "&apos;")):
        c = F.replace(c, F.lit(raw), F.lit(ent))
    return c


def render_sitemaps(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    lastmod_col: str = "lastmod",
    cap: int = 50_000,
    n_buckets: int = 1024,
) -> DataFrame:
    """Render per-host sitemap.xml documents from a crawled pages table
    — the INVERSE of the sitemap scan plane (seed_sitemap_urls /
    expand_sitemap_indexes), for re-publishing a mirror or handing a
    partner the crawl census.  Output rows: ``(host, part, kind, xml,
    n_urls)`` — ``kind='sitemap'`` part files respecting the protocol's
    50,000-URL-per-file cap (sitemaps.org §"Manage large sitemaps"),
    plus one ``kind='index'`` document per multi-part host listing the
    part files.

    Scale shape — the part assignment NEVER sorts a whole host: URLs
    hash into ``n_buckets`` row-local md5 buckets; per-(host, bucket)
    counts form a BOUNDED table (≤ n_buckets rows per host) whose
    running offsets use a window over that bounded table only; the
    global part rank is ``bucket_offset + rank within (host, bucket)``
    — the select_token_budget two-level discipline — so no window
    partition exceeds ~|host|/n_buckets rows.  The per-part document
    string_agg is bounded by the cap (≤ 50k entries ≈ 5 MB).  The
    protocol does not require URL-sorted parts, only the cap;
    bucket-major order is deterministic and resume-stable."""
    b = F.conv(F.substring(F.md5(F.col(url_col)), 1, 8), 16, 10) \
        .cast("long") % n_buckets
    base = pages.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(lastmod_col).alias("lastmod"),
        b.alias("bucket"),
    )
    from pyspark.sql import Window

    counts = base.groupBy("host", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    woff = Window.partitionBy("host").orderBy("bucket")
    offsets = counts.withColumn(
        "offset", (F.sum("n").over(woff) - F.col("n")).cast("long"))
    wrank = Window.partitionBy("host", "bucket").orderBy("url")
    ranked = (
        base.join(offsets.select("host", "bucket", "offset"),
                  ["host", "bucket"])
        .withColumn("rank",
                    (F.row_number().over(wrank) - 1 + F.col("offset"))
                    .cast("long"))
        .withColumn("part", F.expr(f"rank div {int(cap)}").cast("long"))
    )
    entry = F.concat(
        F.lit("<url><loc>"), _xml_escape(F.col("url")),
        F.lit("</loc><lastmod>"), F.col("lastmod"),
        F.lit("</lastmod></url>"),
    )
    parts = (
        ranked.withColumn("entry", entry)
        .groupBy("host", "part")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset '
                      'xmlns="http://www.sitemaps.org/schemas/'
                      'sitemap/0.9">'),
                F.array_join(F.array_sort(F.collect_list(
                    F.struct("rank", "entry"))).entry, ""),
                F.lit("</urlset>"),
            ).alias("xml"),
            F.count(F.lit(1)).cast("long").alias("n_urls"),
        )
        .withColumn("kind", F.lit("sitemap"))
    )
    idx_entry = F.concat(
        F.lit("<sitemap><loc>https://"), F.col("host"),
        F.lit("/sitemap-"), F.col("part").cast("string"),
        F.lit(".xml</loc></sitemap>"),
    )
    index = (
        parts.filter(F.col("part") >= 0)
        .groupBy("host")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                      '<sitemapindex xmlns="http://www.sitemaps.org/'
                      'schemas/sitemap/0.9">'),
                F.array_join(F.array_sort(F.collect_list(
                    F.struct("part", idx_entry.alias("e")))).e, ""),
                F.lit("</sitemapindex>"),
            ).alias("xml"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
        )
        .filter(F.col("n_parts") > 1)
        .select("host", F.lit(-1).cast("long").alias("part"),
                F.lit("index").alias("kind"), "xml",
                F.lit(0).cast("long").alias("n_urls"))
    )
    return parts.select("host", "part", "kind", "xml", "n_urls") \
        .unionByName(index)


def sitemap_scope_audit(
    entries: DataFrame,
    sitemap_col: str = "sitemap_url",
    url_col: str = "url",
) -> DataFrame:
    """sitemaps.org cross-scope rule: a sitemap at
    ``https://h/path/sitemap.xml`` may only declare URLs under
    ``https://h/path/`` — same scheme, same host, path at or below the
    sitemap's directory.  Out-of-scope URLs "will be ignored" by
    conforming consumers, which makes them silent coverage holes: the
    site THINKS those pages are declared (q_sitemap_audit would count
    them as declared) while every crawler drops them.  This audit is
    the publisher-side lint the reference's sitemap spiders
    (zenodo.py/omicsdi.py consume sitemaps verbatim) never run.

    Verdict per declared URL, cheapest test first:

    * ``wrong_origin`` — scheme or host differs from the sitemap's.
    * ``above_path``   — same origin but outside the sitemap's
      directory subtree (the classic /sub/sitemap.xml declaring
      /other/... mistake; a ROOT sitemap scopes the whole host).
    * ``in_scope``     — counted, crawlable via this sitemap.

    Pure whole-stage-codegen string projections — zero shuffles; the
    per-sitemap census is one hash aggregation.

    Output: (sitemap_url, url, verdict).
    """
    sm = F.col(sitemap_col)
    u = F.col(url_col)
    scope = F.regexp_replace(sm, r"[^/]*$", "")
    origin = F.regexp_extract(sm, r"^(https?://[^/]+)", 1)
    u_origin = F.regexp_extract(u, r"^(https?://[^/]+)", 1)
    # the bare-origin homepage ('https://a.com', no trailing slash --
    # common generator output) IS the root path (review finding: the
    # raw startswith check verdicted it above_path for root sitemaps)
    u_norm = F.when(u == u_origin, F.concat(u, F.lit("/"))).otherwise(u)
    verdict = (
        F.when(u_origin != origin, F.lit("wrong_origin"))
        .when(~u_norm.startswith(scope), F.lit("above_path"))
        .otherwise(F.lit("in_scope"))
    )
    return entries.select(
        sm.alias("sitemap_url"), u.alias("url"), verdict.alias("verdict"))


def sitemap_scope_census(audited: DataFrame) -> DataFrame:
    """Per-sitemap rollup of :func:`sitemap_scope_audit`: declared /
    ignored counts and an exact ignored ppm — the publisher lint
    report. One hash aggregation."""
    ignored = F.when(F.col("verdict") != "in_scope", 1).otherwise(0)
    return audited.groupBy("sitemap_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_declared"),
        F.sum(ignored).cast("long").alias("n_ignored"),
        F.expr(
            "sum(case when verdict <> 'in_scope' then 1 else 0 end)"
            " * 1000000 div count(1)"
        ).cast("long").alias("ignored_ppm"),
    )
