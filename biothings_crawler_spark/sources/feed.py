"""RSS / Atom feed parsing — the polling discovery source.

Feeds are the web's push-less change notification: a crawler that
polls them learns about NEW and UPDATED pages without recrawling the
site (the same job sitemaps do, but feeds carry richer per-entry
metadata and update faster).  The reference harvests curated APIs;
feeds are the open-web equivalent of its incremental-API sources
(reference ``crawler/spiders`` poll dated API cursors — a feed IS a
dated cursor served as XML).

Parsing is the sitemap recipe (sources/sitemap.py): regex over entry
blocks, ``(?s)`` non-greedy, RE2-safe so the DuckDB oracle can run the
identical patterns.  Both formats normalize into one schema:

    (feed_url, kind, title, link, entry_id, published_raw, ts14)

``ts14`` is the same yyyymmddHHMMSS sort key the CDX index uses —
RFC-822 dates (RSS ``pubDate``) go through an exact month-name map +
zero-padding, ISO-8601 dates (Atom ``updated``) through digit
stripping; no timezone math (feeds overwhelmingly publish GMT/Z — a
production variant would normalize offsets; documented, not hidden).
Scale shape: one explode per format + row-local extracts — zero
exchanges, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MONTHS = {
    "Jan": "01", "Feb": "02", "Mar": "03", "Apr": "04", "May": "05",
    "Jun": "06", "Jul": "07", "Aug": "08", "Sep": "09", "Oct": "10",
    "Nov": "11", "Dec": "12",
}

# RFC-822: "Tue, 12 Aug 2026 07:30:05 GMT" (day-of-week optional)
_RFC822_RE = (
    r"([0-9]{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
    r" ([0-9]{4}) ([0-9]{2}):([0-9]{2}):([0-9]{2})"
)


def _cdata_strip(c: Column) -> Column:
    return F.regexp_replace(c, r"(?s)^<!\[CDATA\[(.*)\]\]>$", "$1")


def _field(block: Column, tag: str) -> Column:
    return F.regexp_extract(block, f"(?s)<{tag}[^>]*>\\s*(.*?)\\s*</{tag}>", 1)


def rfc822_ts14(raw: Column) -> Column:
    """RFC-822 date string -> yyyymmddHHMMSS (empty when unparseable).
    Exact string surgery: month map + lpad — no locale, no timezone
    arithmetic."""
    mon_map = F.create_map(*[F.lit(x) for kv in _MONTHS.items() for x in kv])
    g = lambda i: F.regexp_extract(raw, _RFC822_RE, i)  # noqa: E731
    out = F.concat(
        g(3), mon_map[g(2)], F.lpad(g(1), 2, "0"), g(4), g(5), g(6)
    )
    return F.when(g(3) != "", out).otherwise(F.lit(""))


def iso_ts14(raw: Column) -> Column:
    """ISO-8601 date string -> yyyymmddHHMMSS digits (first 14)."""
    digits = F.regexp_replace(raw, r"[^0-9]", "")
    return F.when(raw != "", F.substring(digits, 1, 14)).otherwise(F.lit(""))


def parse_feed(
    df: DataFrame, url_col: str = "feed_url", body_col: str = "body",
) -> DataFrame:
    """Feed XML -> one row per entry, RSS ``<item>`` and Atom
    ``<entry>`` both handled (a feed is whichever block kind it
    contains; title CDATA wrappers stripped; Atom links live in the
    ``href`` attribute, RSS links in element text; entries with no
    link are dropped — nothing to crawl)."""
    body = F.col(body_col)
    items = F.regexp_extract_all(body, F.lit(r"(?s)<item>(.*?)</item>"), 1)
    entries = F.regexp_extract_all(body, F.lit(r"(?s)<entry>(.*?)</entry>"), 1)
    kind = F.when(F.size(items) > 0, F.lit("rss")).otherwise(F.lit("atom"))
    blocks = F.when(F.size(items) > 0, items).otherwise(entries)
    pe = df.select(
        F.col(url_col).alias("feed_url"), kind.alias("kind"),
        F.explode(blocks).alias("b"),
    )
    b = F.col("b")
    is_rss = F.col("kind") == "rss"
    link = F.when(
        is_rss, _field(b, "link")
    ).otherwise(F.regexp_extract(b, r'(?s)<link[^>]*href="([^"]*)"', 1))
    published_raw = F.when(is_rss, _field(b, "pubDate")).otherwise(
        _field(b, "updated"))
    ts14 = F.when(is_rss, rfc822_ts14(published_raw)).otherwise(
        iso_ts14(published_raw))
    return (
        pe.select(
            "feed_url", "kind",
            _cdata_strip(_field(b, "title")).alias("title"),
            link.alias("link"),
            F.when(is_rss, _field(b, "guid"))
            .otherwise(_field(b, "id")).alias("entry_id"),
            published_raw.alias("published_raw"),
            ts14.alias("ts14"),
        )
        .filter(F.col("link") != "")
    )


def feed_new_entries(
    parsed: DataFrame, seen_ids: DataFrame, id_col: str = "entry_id",
) -> DataFrame:
    """The polling step's output: entries whose id the previous poll
    has not recorded — one left_anti join on entry_id (the same
    seen-set shape as URL dedup; bucketable on the id key)."""
    return parsed.join(
        seen_ids.select(F.col(id_col)), on=id_col, how="left_anti")


def render_atom(
    entries: DataFrame,
    feed_col: str = "feed_url",
    cap: int = 50,
) -> DataFrame:
    """Render canonical Atom feeds from an entries table — the fourth
    parse/render symmetry (robots, sitemap, WARC trio), and the
    publishing side of the polling loop: a mirror republishes what it
    crawled, and ``parse_feed(render_atom(e))`` recovering the entries
    is the cheapest full-coverage proof (pytest-pinned).

    Entries: (feed_url, entry_id, title, link, updated_iso).  Per
    feed: newest ``cap`` entries by (updated desc, entry_id) — the
    bounded-feed convention every real publisher follows — rendered
    newest-first; titles XML-escaped; one row per feed with the
    document and its entry count.

    Scale shape: the per-feed top-cap is a (feed) window over entry
    rows — bounded output per feed by construction — then one
    string_agg bounded by the cap; at 10^8 feeds both shuffles key on
    feed_url with near-unique keys."""
    from pyspark.sql import Window

    esc = F.col("title")
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(raw), F.lit(ent))
    w = Window.partitionBy("feed").orderBy(
        F.desc("updated_iso"), F.asc("entry_id"))
    ranked = entries.select(
        F.col(feed_col).alias("feed"), "entry_id", "link", "updated_iso",
        esc.alias("title_esc"),
    ).withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= cap)
    entry_xml = F.concat(
        F.lit("<entry><id>"), F.col("entry_id"),
        F.lit("</id><title>"), F.col("title_esc"),
        F.lit('</title><link href="'), F.col("link"),
        F.lit('"/><updated>'), F.col("updated_iso"),
        F.lit("</updated></entry>"),
    )
    return (
        ranked.withColumn("e", entry_xml)
        .groupBy("feed")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0" encoding="utf-8"?>'
                      '<feed xmlns="http://www.w3.org/2005/Atom">'),
                F.array_join(
                    F.array_sort(F.collect_list(F.struct("_r", "e"))).e,
                    ""),
                F.lit("</feed>"),
            ).alias("atom_xml"),
            F.count(F.lit(1)).cast("long").alias("n_entries"),
        )
        .select(F.col("feed").alias("feed_url"), "atom_xml", "n_entries")
    )
