"""Vectorized extraction UDFs — the engine side of the byte-identity gate.

The reference extracts metadata row-at-a-time in Scrapy callbacks
(crawler/spiders/helper.py:30-50 JSON-LD, ncbi_geo.py:29-53 GEO tables,
LinkExtractor link-follow). Here each becomes an Arrow-batched pandas
UDF (never a row-at-a-time Spark Python UDF — BASELINE.json input_hint):

  * :func:`extract_items_udf` — (html, url, parser) -> array<canonical
    JSON item strings>. UDTF-shaped: callers ``explode`` it. The JSON-LD
    path is an *independent* implementation (regex script scan) of the
    frozen oracle's html.parser walk; tests assert byte-equality per url
    against both the oracle and the pages fixture's golden ``text``.
  * :func:`extract_links_udf` — (html, url) -> array<absolute hrefs>
    (urljoin'd, document order, duplicates preserved — the frontier
    dedups later, like Scrapy's scheduler did).
  * :func:`page_text_col` — canonical text of a page derived natively
    from the items array (no extra Python): text == canonical JSON of
    the item list.

Scale notes: these UDFs run once per fetched page in the crawl round
loop — the only Python in the hot path, Arrow-batched at
``spark.sql.execution.arrow.maxRecordsPerBatch`` rows per batch. All
downstream ops (hashing, dedup, joins, windows) stay JVM-side.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from biothings_crawler_spark.functions.json_canon import canonical_json
from biothings_crawler_spark.oracle.geo_table import parse_geo_table
from biothings_crawler_spark.oracle.jsonld import HTML_OR_JS_COMMENTLINE
from biothings_crawler_spark.urlnorm import urljoin

# independent JSON-LD script scan (engine side; oracle uses html.parser)
_SCRIPT_RE = re.compile(
    r"<script[^>]*\stype=(?:\"application/ld\+json\"|'application/ld\+json')[^>]*>(.*?)</script>",
    re.IGNORECASE | re.DOTALL,
)
_HREF_RE = re.compile(
    r"""<a\s[^>]*?href=(?:"([^"]*)"|'([^']*)')""", re.IGNORECASE | re.DOTALL
)


def _jsonld_items(html: str, url: str) -> list[str]:
    items: list[str] = []
    for m in _SCRIPT_RE.finditer(html):
        script = m.group(1)
        try:
            data = json.loads(script, strict=False)
        except ValueError:
            try:
                data = json.loads(HTML_OR_JS_COMMENTLINE.sub("", script), strict=False)
            except ValueError:
                continue
        if isinstance(data, dict):
            data = [data] if data else []
        elif isinstance(data, list):
            data = [d for d in data if d]
        else:
            continue
        for item in data:
            if isinstance(item, dict):
                item = dict(item)
                item["_id"] = url  # helper.py:44-45 (no explicit _id in batch mode)
            items.append(canonical_json(item))
    return items


def _geo_items(html: str) -> list[str]:
    data = parse_geo_table(html)
    return [canonical_json(data)] if data else []


def _decode(b) -> str:
    if b is None:
        return ""
    if isinstance(b, (bytes, bytearray)):
        return bytes(b).decode("utf-8", errors="replace")
    return str(b)


def _mainentity_items(html: str, url: str) -> list[str]:
    """omicsdi unwrap (omicsdi.py:31-33): emit jsld['mainEntity'] when
    truthy; the wrapper's injected _id is NOT propagated (Scrapy drops
    the None yields silently)."""
    out = []
    for item_json in _jsonld_items(html, url):
        inner = json.loads(item_json).get("mainEntity")
        if inner:
            out.append(canonical_json(inner))
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_items_udf(html: pd.Series, url: pd.Series, parser: pd.Series) -> pd.Series:
    out = []
    for h, u, p in zip(html, url, parser):
        text = _decode(h)
        if p == "geo_table":
            out.append(_geo_items(text))
        elif p == "jsonld_mainentity":
            out.append(_mainentity_items(text, u))
        else:
            out.append(_jsonld_items(text, u))
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    out = []
    for h, base in zip(html, url):
        text = _decode(h)
        links = []
        for m in _HREF_RE.finditer(text):
            href = m.group(1) if m.group(1) is not None else m.group(2)
            if not href or href.startswith(("#", "javascript:", "mailto:")):
                continue
            links.append(urljoin(base, href))
        out.append(links)
    return pd.Series(out)


def page_text_col(items: Column) -> Column:
    """Canonical page text from the items array, derived JVM-side.

    Each element is already canonical JSON, so the page text is exactly
    ``"[" + join(items, ",") + "]"`` — byte-identical to
    ``canonical_json(list_of_items)``.
    """
    return F.concat(F.lit("["), F.array_join(items, ","), F.lit("]"))


def html_to_text_col(html: Column) -> Column:
    """Main-content extraction: HTML (binary, UTF-8) -> readable text,
    entirely as native regexp/replace expressions (JVM codegen, zero
    Python, zero shuffle) — the batch analog of the readability pass a
    web-text pipeline runs on every Common-Crawl page before quality
    filtering. Deliberately RE2-compatible (no lookaround/backrefs) so
    the DuckDB oracle (q_html_to_text) runs the identical pipeline.

    Passes, in order: drop <script>/<style> blocks and comments ->
    block-closing tags and <br> become newlines -> every remaining tag
    becomes a space -> decode the six core entities (&amp; last, per
    HTML semantics: '&amp;lt;' must yield literal '&lt;') -> collapse
    horizontal whitespace, tighten newlines, cap blank runs, trim."""
    t = F.decode(html, "UTF-8")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", "")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", "")
    t = F.regexp_replace(t, r"(?i)<br[^>]*>|</(p|div|h[1-6]|li|tr|title)>", "\n")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    t = F.replace(t, F.lit("&nbsp;"), F.lit(" "))
    t = F.replace(t, F.lit("&lt;"), F.lit("<"))
    t = F.replace(t, F.lit("&gt;"), F.lit(">"))
    t = F.replace(t, F.lit("&quot;"), F.lit('"'))
    t = F.replace(t, F.lit("&#39;"), F.lit("'"))
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))
    t = F.regexp_replace(t, r"[^\S\n]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def _hub_hrefs(node, out: list) -> None:
    if node.tag == "a":
        href = node.attrib.get("href")
        if href:
            out.append(href)
    for c in node.child_elems():
        _hub_hrefs(c, out)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_hub_table_links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """CLIC hub-table seed expansion round 0 (reference clic.py:80-81):
    the hrefs inside the first <table> of the page, urljoin'd, document
    order. Same mini-DOM as the GEO scraper (oracle/geo_table.py)."""
    from biothings_crawler_spark.oracle.geo_table import build_dom

    out = []
    for h, base in zip(html, url):
        dom = build_dom(h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray)) else h)
        tables = dom.descendants("table")
        links: list[str] = []
        if tables:
            _hub_hrefs(tables[0], links)
        out.append([urljoin(base, x) for x in links])
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_website_field_links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """CLIC hub round 1 (reference clic.py:88-92): rows whose first-cell
    label starts with 'Website' contribute their hrefs — the external
    site roots the broad crawl then follows."""
    from biothings_crawler_spark.oracle.geo_table import build_dom

    out = []
    for h, base in zip(html, url):
        dom = build_dom(h.decode("utf-8", errors="replace") if isinstance(h, (bytes, bytearray)) else h)
        links: list[str] = []
        for tr in dom.descendants("tr"):
            tds = tr.child_elems("td")
            if not tds:
                continue
            label = "".join(tds[0].texts()).strip()
            if label.startswith("Website"):
                for td in tds[1:]:
                    _hub_hrefs(td, links)
        out.append([urljoin(base, x) for x in links])
    return pd.Series(out)


# ---------------------------------------------------------------------------
# anchor-text index (pure codegen — no Python in the hot path)
# ---------------------------------------------------------------------------

_ANCHOR_RE = r'<a\s+href="([^"]*)"[^>]*>([^<]*)</a>'


def anchor_pairs_col(html_text: Column, base_url: Column) -> Column:
    """``array<struct<target,text>>`` of a page's resolved anchors.

    The classic web-search signal the reference never needed (Scrapy's
    LinkExtractor drops anchor text; reference link-follow keeps hrefs
    only) but a search/ranking pipeline over the crawl output does:
    what OTHER pages call a URL.  Pure JVM expressions end-to-end —
    ``regexp_extract_all`` of the whole ``<a>`` element, then per-match
    group extraction inside :func:`F.transform` (no second pass over
    the document, no Python).

    Resolution keeps absolute http(s) hrefs and root-relative hrefs
    (``/path`` joined onto the page's scheme+host); other forms
    (dir-relative, mailto:, javascript:) resolve to NULL and are
    filtered — at crawl scale they're noise the frontier never admits
    anyway.  Both regexes are RE2-safe so the DuckDB oracle runs the
    identical pipeline.
    """
    ms = F.regexp_extract_all(html_text, F.lit(_ANCHOR_RE), F.lit(0))
    root = F.regexp_extract(base_url, r"^(https?://[^/]+)", 1)

    def _resolve(m: Column) -> Column:
        href = F.regexp_extract(m, _ANCHOR_RE, 1)
        txt = F.trim(F.regexp_extract(m, _ANCHOR_RE, 2))
        tgt = (
            F.when(href.rlike(r"^https?://"), href)
            .when(href.startswith("/"), F.concat(root, href))
            .otherwise(F.lit(None).cast("string"))
        )
        return F.struct(tgt.alias("target"), txt.alias("text"))

    return F.filter(
        F.transform(ms, _resolve), lambda s: s.getField("target").isNotNull()
    )


def anchor_text_index(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Corpus-wide anchor-text table ``(target_url, anchor_text,
    n_refs)`` — the inlink-text aggregation a ranking stage joins
    against the document table.

    Shape: per-page array build (narrow), ``explode``, ONE hash
    aggregation keyed by (target, text) with map-side partials — the
    same scale class as exact dedup.  No windows, no joins; hot
    targets spread across reducers because the key includes the
    anchor text.
    """
    txt = F.decode(F.col(html_col), "utf-8")
    pairs = anchor_pairs_col(txt, F.col(url_col))
    return (
        pages.select(F.explode(pairs).alias("a"))
        .groupBy(
            F.col("a.target").alias("target_url"),
            F.col("a.text").alias("anchor_text"),
        )
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )


# block-level boundaries for text-density segmentation
_BLOCK_SPLIT_RE = r"(?i)</?(?:p|div|td|li|h[1-6]|section|article|table|ul|ol|br)[^>]*>"


def extract_main_content(
    df,
    id_col: str,
    html_col: str,
    min_words: int = 10,
    max_link_ppm: int = 333_333,
):
    """Boilerpipe-style main-content extraction (Kohlschütter et al.
    2010, by way of trafilatura's density heuristics): segment HTML at
    block-level tags, score each block by word count and LINK density
    (words inside ``<a>`` / words total, in exact ppm), and keep only
    content-dense blocks — nav bars, footers, and link farms are
    word-sparse or link-saturated.  The refinement pass OVER
    :func:`html_to_text_col`'s whole-page flattening: same corpus
    stage, stricter output.

    Returns ``(id, main_text, n_blocks, n_kept)``; ``main_text`` joins
    surviving blocks with newlines, inner whitespace collapsed.

    Scale shape: one row-local split + two higher-order transforms +
    a filter — ZERO exchanges, no Python; every regex is RE2-safe so
    the DuckDB oracle (q_main_content) runs the identical pipeline.
    """
    ws = ("size(filter(split({t}, '\\\\s+'), x -> length(x) > 0))")
    txt = ("trim(regexp_replace(regexp_replace({b}, '<[^>]*>', ' '), "
           "'\\\\s+', ' '))")
    atxt = ("regexp_replace(array_join(regexp_extract_all({b}, "
            "'(?is)<a[^>]*>(.*?)</a>', 1), ' '), '<[^>]*>', ' ')")
    feats = (
        f"transform(split(CAST({html_col} AS STRING), '{_BLOCK_SPLIT_RE}'), "
        f"b -> named_struct("
        f"'txt', {txt.format(b='b')}, "
        f"'w', {ws.format(t=txt.format(b='b'))}, "
        f"'aw', {ws.format(t=atxt.format(b='b'))}))"
    )
    kept = (
        f"filter({feats}, f -> f.w >= {int(min_words)} AND "
        f"(f.aw * 1000000) div greatest(f.w, 1) <= {int(max_link_ppm)})"
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"array_join(transform({kept}, f -> f.txt), '\\n')")
        .alias("main_text"),
        F.expr(f"size({feats})").cast("long").alias("n_blocks"),
        F.expr(f"size({kept})").cast("long").alias("n_kept"),
    )


# rel=canonical collapse (pure codegen — no Python in the hot path)
# ---------------------------------------------------------------------------

_CANON_RE1 = r'(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"'
_CANON_RE2 = r'(?i)<link[^>]*href="([^"]*)"[^>]*rel="canonical"'


def canonical_map(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page ``(url, canonical_url, is_canonical)`` from the HTML
    ``<link rel="canonical">`` hint — the site's OWN dedup signal,
    which a crawler should trust before spending content-hash or
    MinHash cycles: print views, tracking-parameter variants, and
    pagination aliases all declare the same canonical.  The reference
    fetches curated URLs and never sees alias families; a Common-Crawl
    frontier is ~20% alias pages.

    Both attribute orders (``rel`` before/after ``href``) are
    extracted; absolute http(s) targets are kept, root-relative ones
    join the page's scheme+host (same resolution contract as
    :func:`anchor_pairs_col`), anything else — including pages with no
    hint — canonicalizes to ITSELF.  Row-local projection: ZERO
    exchanges, no Python, RE2-safe regexes for the DuckDB twin.
    """
    txt = F.decode(F.col(html_col), "utf-8")
    href = F.coalesce(
        F.nullif(F.regexp_extract(txt, _CANON_RE1, 1), F.lit("")),
        F.nullif(F.regexp_extract(txt, _CANON_RE2, 1), F.lit("")),
    )
    root = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)
    canon = (
        F.when(href.rlike(r"^https?://"), href)
        .when(href.startswith("/"), F.concat(root, href))
        .otherwise(F.col(url_col))
    )
    return pages.select(
        F.col(url_col).alias("url"),
        canon.alias("canonical_url"),
        (canon == F.col(url_col)).alias("is_canonical"),
    )


def canonical_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Alias clusters from :func:`canonical_map`: ``(canonical_url,
    n_pages, n_aliases, has_canonical_page)``.  The frontier keeps one
    fetch per cluster (the canonical if crawled, else any alias), so
    ``n_aliases`` is crawl budget directly recovered.

    Shape: the row-local map, then ONE hash aggregation keyed by
    canonical_url with map-side partials.  No windows, no joins.
    """
    m = canonical_map(pages, url_col, html_col)
    return m.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum((~F.col("is_canonical")).cast("long")).alias("n_aliases"),
        F.max(F.col("is_canonical")).alias("has_canonical_page"),
    )


# hreflang alternate-language links (pure codegen)
# ---------------------------------------------------------------------------

_HREFLANG_RE = (
    r'(?i)<link[^>]*rel="alternate"[^>]*hreflang="([^"]*)"[^>]*href="([^"]*)"'
)


def hreflang_map(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page language-alternate edges ``(url, lang, target_url)``
    from ``<link rel="alternate" hreflang=...>`` — the signal that
    keeps a multilingual site's variants OUT of near-dup dedup (they
    are translations, not duplicates) and routes each language's pages
    to its language-specific pipeline.  Same resolution contract as
    :func:`canonical_map`: absolute http(s) kept, root-relative joined
    onto the page host, everything else dropped.  Row-local
    ``regexp_extract_all`` + per-match group extraction inside
    ``transform`` — one projection, zero exchanges, no Python.
    """
    txt = F.decode(F.col(html_col), "utf-8")
    ms = F.regexp_extract_all(txt, F.lit(_HREFLANG_RE), F.lit(0))
    root = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)

    def _one(m: Column) -> Column:
        lang = F.lower(F.regexp_extract(m, _HREFLANG_RE, 1))
        href = F.regexp_extract(m, _HREFLANG_RE, 2)
        tgt = (
            F.when(href.rlike(r"^https?://"), href)
            .when(href.startswith("/"), F.concat(root, href))
            .otherwise(F.lit(None).cast("string"))
        )
        return F.struct(lang.alias("lang"), tgt.alias("target"))

    pairs = F.filter(
        F.transform(ms, _one), lambda s: s.getField("target").isNotNull()
    )
    # the generator lives in its own projection: explode() next to an
    # identically-named alias trips Spark's lateral-column-alias
    # resolution into an internal error (LateralColumnAliasReference)
    staged = pages.select(F.col(url_col).alias("url"), pairs.alias("ps"))
    return staged.select("url", F.explode("ps").alias("a")).select(
        "url", F.col("a.lang").alias("lang"), F.col("a.target").alias("target_url")
    )


def hreflang_reciprocity(alternates: DataFrame) -> DataFrame:
    """Validate the alternate graph: ``(url, lang, target_url,
    is_reciprocal)`` — an hreflang edge only counts for search engines
    when the TARGET page links back to the source (any language), and
    non-reciprocal edges are the classic multilingual-SEO
    misconfiguration a crawl-quality report should surface.

    Shape: distinct edge set, then ONE left-semi self-join on the
    reversed (url, target) pair — the link_farm_report pattern; the
    edge domain is pages×languages, never pages².
    """
    edges = alternates.select("url", "lang", "target_url").distinct()
    back = edges.select(
        F.col("target_url").alias("url"), F.col("url").alias("target_url")
    ).distinct()
    recip = edges.join(back, ["url", "target_url"], "left_semi").select(
        "url", "target_url", F.lit(True).alias("is_reciprocal")
    )
    return (
        edges.join(recip, ["url", "target_url"], "left")
        .select(
            "url", "lang", "target_url",
            F.coalesce("is_reciprocal", F.lit(False)).alias("is_reciprocal"),
        )
    )


# ---------------------------------------------------------------------------
# meta robots / X-Robots-Tag enforcement (pure codegen)
# ---------------------------------------------------------------------------

_META_ROBOTS_RE1 = (
    r"""(?i)<meta[^>]*name\s*=\s*["']?robots["']?[^>]*"""
    r"""content\s*=\s*["']([^"']*)["']"""
)
_META_ROBOTS_RE2 = (
    r"""(?i)<meta[^>]*content\s*=\s*["']([^"']*)["'][^>]*"""
    r"""name\s*=\s*["']?robots["']?"""
)


def meta_robots(
    pages: DataFrame,
    html_col: str = "html",
    header_col: str | None = "x_robots_tag",
) -> DataFrame:
    """Per-page index/follow directives from ``<meta name="robots">``
    tags (ALL of them — directives union across tags, both attribute
    orders) and the ``X-Robots-Tag`` response header, per the
    Robots-Exclusion-Protocol page-level extension (RFC 9309 covers
    only robots.txt; the meta/header form is the de-facto REP spec
    both Google and Bing document).

    Adds ``noindex`` and ``nofollow`` booleans: ``none`` implies both,
    ``all`` implies neither, unknown directives (``noarchive``,
    ``nosnippet``) are ignored.  robots.txt says "don't FETCH";
    meta-robots says "you fetched, but don't INDEX / don't follow my
    links" — a compliant engine needs both gates (robots.txt
    enforcement: operators/robots.py).  Row-local regex projection,
    zero exchange, zero Python.
    """
    txt = F.decode(F.col(html_col), "utf-8")
    metas = F.concat(
        F.array_join(
            F.regexp_extract_all(txt, F.lit(_META_ROBOTS_RE1), 1), " "),
        F.lit(" "),
        F.array_join(
            F.regexp_extract_all(txt, F.lit(_META_ROBOTS_RE2), 1), " "),
    )
    hdr = (
        F.coalesce(F.col(header_col), F.lit("")) if header_col
        else F.lit("")
    )
    combined = F.lower(F.concat(metas, F.lit(" "), hdr))
    none_ = combined.rlike(r"\bnone\b")
    return pages.withColumn(
        "noindex", combined.rlike(r"\bnoindex\b") | none_
    ).withColumn(
        "nofollow", combined.rlike(r"\bnofollow\b") | none_
    )


def enforce_meta_robots(
    flagged: DataFrame, links: DataFrame,
    url_col: str = "url", src_col: str = "src",
) -> tuple[DataFrame, DataFrame]:
    """Apply the page-level directives: the INDEXABLE page set (drop
    ``noindex`` rows — a filter, no shuffle) and the FOLLOWABLE link
    set (drop edges whose source page is ``nofollow`` — one left_semi
    join against the nofollow-free page set, bucketable on the url
    key shared with the link table's src)."""
    indexable = flagged.filter(~F.col("noindex"))
    follow_src = flagged.filter(~F.col("nofollow")).select(
        F.col(url_col).alias(src_col))
    followable = links.join(follow_src, on=src_col, how="left_semi")
    return indexable, followable


# ---------------------------------------------------------------------------
# Open Graph / Twitter card metadata (pure codegen)
# ---------------------------------------------------------------------------

def _meta_content(txt: Column, attr: str, name: str) -> Column:
    """content of ``<meta {attr}="{name}" content="...">``, either
    attribute order; null when absent."""
    r1 = (rf'(?i)<meta[^>]*{attr}\s*=\s*["\']{name}["\'][^>]*'
          r'content\s*=\s*["\']([^"\']*)["\']')
    r2 = (rf'(?i)<meta[^>]*content\s*=\s*["\']([^"\']*)["\'][^>]*'
          rf'{attr}\s*=\s*["\']{name}["\']')
    return F.nullif(
        F.coalesce(
            F.nullif(F.regexp_extract(txt, r1, 1), F.lit("")),
            F.nullif(F.regexp_extract(txt, r2, 1), F.lit("")),
            F.lit(""),
        ),
        F.lit(""),
    )


def opengraph(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Open Graph / Twitter card extraction — the social-preview
    metadata block (ogp.me).  For a webtext pipeline it is the
    cheapest high-precision title/description/image source: publishers
    curate og:* for link previews far more reliably than <title> tags.
    Adds ``og_title``, ``og_description``, ``og_image``,
    ``twitter_card`` (nulls when absent).  Both attribute orders per
    tag; row-local regex projection — zero exchange, zero Python."""
    txt = F.decode(F.col(html_col), "utf-8")
    return (
        pages.withColumn("og_title", _meta_content(txt, "property", "og:title"))
        .withColumn("og_description",
                    _meta_content(txt, "property", "og:description"))
        .withColumn("og_image", _meta_content(txt, "property", "og:image"))
        .withColumn("twitter_card", _meta_content(txt, "name", "twitter:card"))
    )


def html_tables(
    df: DataFrame,
    id_col: str,
    html_col: str,
) -> DataFrame:
    """Generic HTML table extraction — the structured-data modality a
    webtext corpus mines beside running text (WikiTables-style; the
    source-specific GEO scraper in oracle/geo_table.py is the
    reference-parity sibling, this is the corpus-wide operator).

    One output row per CELL: (id, table_idx, row, col, cell, is_header)
    — table/row/column indexes are 0-based document order, header cells
    are ``<th>``, inner markup is stripped and entities are NOT decoded
    (that is html_entities' job downstream; single-responsibility like
    the rest of the extract plane).  Out of scope, documented: rowspan/
    colspan expansion and nested tables (the inner table's cells parse
    as part of the outer cell stream in both engines identically).

    Scale shape: three nested row-local ``regexp_extract_all`` +
    posexplode levels — no shuffle at all until whatever aggregation
    the caller adds; the plan is scan -> generate -> project."""
    tables = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.expr(rf"regexp_extract_all({html_col}, "
                   r"'(?s)<table[^>]*>(.*?)</table>', 1)")
        ).alias("table_idx", "tbl"),
    )
    rows = tables.select(
        "id", "table_idx",
        F.posexplode(
            F.expr(r"regexp_extract_all(tbl, '(?s)<tr[^>]*>(.*?)</tr>', 1)")
        ).alias("row", "tr"),
    )
    cells = rows.select(
        "id", "table_idx", "row",
        F.posexplode(
            F.expr(r"regexp_extract_all(tr, "
                   r"'(?s)<(t[dh])[^>]*>(.*?)</t[dh]>', 2)")
        ).alias("col", "raw"),
        F.expr(r"regexp_extract_all(tr, "
               r"'(?s)<(t[dh])[^>]*>(.*?)</t[dh]>', 1)").alias("_kinds"),
    )
    return cells.select(
        "id",
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row").cast("long").alias("row"),
        F.col("col").cast("long").alias("col"),
        F.trim(F.regexp_replace("raw", r"(?s)<[^>]*>", " ")).alias("cell"),
        F.when(F.element_at("_kinds", F.col("col") + 1) == "th",
               F.lit(1)).otherwise(F.lit(0)).cast("long")
        .alias("is_header"),
    )


def js_required_col(html: Column) -> dict:
    """Client-side-rendering detection — the routing gate that decides
    which URLs need a headless-browser fetch queue instead of the
    plain HTTP fetcher (the reference's Scrapy stack has the same
    split: SitemapSpider vs the Splash-style render path its
    static-SPA sources would need; SURVEY §2.10 records remote-exec as
    the sanctioned non-goal, and THIS operator is the batch side of
    that decision).

    Pure codegen metrics over the raw HTML string:

    * ``script_ratio_ppm`` — bytes inside <script> blocks / total,
    * ``visible_len`` — text length after a cheap strip pass,
    * ``spa_mount`` — an empty <div id="root|app"> mount point,
    * ``has_noscript`` — a <noscript> fallback is present.

    ``js_required`` = spa_mount OR (visible text < 80 chars AND any
    script) OR script_ratio > 60%.  Returns a dict of named Columns so
    callers project what they need (single pass, zero shuffle)."""
    stripped = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", "")
    visible = F.trim(F.regexp_replace(F.regexp_replace(F.regexp_replace(
        stripped, r"(?is)<style[^>]*>.*?</style>", ""),
        r"<[^>]+>", " "), r"\s+", " "))
    script_bytes = F.length(html) - F.length(stripped)
    # exact integer ppm: decimal(38,0) numerator / int, floored —
    # identical to DuckDB's BIGINT // for non-negative operands
    ratio = F.floor(
        (script_bytes.cast("decimal(38,0)") * 1_000_000)
        / F.greatest(F.length(html), F.lit(1))
    ).cast("long")
    spa = html.rlike(r'(?i)<div id="(root|app)"\s*>\s*</div>')
    nos = html.rlike(r"(?i)<noscript[\s>]")
    vlen = F.length(visible)
    return {
        "script_ratio_ppm": ratio,
        "visible_len": vlen.cast("long"),
        "spa_mount": F.when(spa, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        "has_noscript": F.when(nos, F.lit(1)).otherwise(F.lit(0))
        .cast("long"),
        "js_required": F.when(
            spa | ((vlen < 80) & (script_bytes > 0)) | (ratio > 600_000),
            F.lit(1)).otherwise(F.lit(0)).cast("long"),
    }


# --- typed identifier extraction -------------------------------------
#
# The reference's whole purpose is harvesting dataset metadata
# (GEO/ImmPort/Zenodo spiders, crawler/spiders/*); free text on the
# same pages carries typed identifiers those structured paths miss.
# All patterns are RE2-safe (shared verbatim with the DuckDB twin) and
# anchored on word boundaries so prose like 'GSE12345x' cannot half-
# match.

ID_PATTERNS = [
    # (kind, regex with ONE capture group)
    ("doi", r"\b(10\.[0-9]{4,9}/[-._;()/:A-Za-z0-9]+)"),
    ("geo_series", r"\b(GSE[0-9]{3,8})\b"),
    ("geo_sample", r"\b(GSM[0-9]{3,8})\b"),
    ("sra_run", r"\b([SED]RR[0-9]{5,9})\b"),
    ("pdb", r"\bPDB[ :]([0-9][A-Za-z0-9]{3})\b"),
    ("pmid", r"\bPMID[: ]{0,2}([0-9]{1,8})\b"),
]


def extract_identifiers(
    pages: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (document, kind, identifier occurrence) — DOI, GEO
    series/sample, SRA run, PDB entry, PMID — duplicates preserved in
    document order per kind (the mention COUNT is signal: a dataset
    landing page mentions its own accession many times, a citing page
    once).  Pure whole-stage-codegen ``regexp_extract_all`` chain +
    one bounded explode per kind; zero shuffles, zero Python.

    Output: (id, kind, ident, n_in_doc) with n_in_doc the document's
    total mention count for that kind.
    """
    t = F.col(text_col)
    per_kind = F.array(*[
        F.struct(
            F.lit(kind).alias("kind"),
            F.regexp_extract_all(t, F.lit(rx), 1).alias("hits"),
        )
        for kind, rx in ID_PATTERNS
    ])
    rows = pages.select(
        F.col(id_col).alias("id"), F.explode(per_kind).alias("k")
    ).select(
        "id", F.col("k.kind").alias("kind"), F.col("k.hits").alias("hits")
    ).filter(F.size("hits") > 0)
    return rows.select(
        "id", "kind",
        F.explode("hits").alias("ident"),
        F.size("hits").cast("long").alias("n_in_doc"),
    )
