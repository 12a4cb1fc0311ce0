"""AI-training / TDM opt-out compliance (the 2023+ page-level signals).

A training-data pipeline at Common-Crawl scale has to honor the
machine-readable opt-outs publishers actually ship today, which go
beyond the classic REP page directives (``operators/extract
.meta_robots``):

* ``noai`` / ``noimageai`` — the DeviantArt-originated directives,
  carried either in ``<meta name="robots">`` content or in the
  ``X-Robots-Tag`` response header (adopted by several CMSes and by
  the img-srcset CDNs; not an IETF standard, but the de-facto corpus
  signal).
* TDM Reservation Protocol (W3C TDM-Rep CG): ``<meta
  name="tdm-reservation" content="1">`` or the ``tdm-reservation: 1``
  HTTP header reserves text-and-data-mining rights under the EU DSM
  directive Art. 4 — content ``0`` explicitly waives the reservation.

Reference anchor: the crawler's politeness/robots plane
(crawler/settings.py ROBOTSTXT_OBEY) handles fetch-time consent; this
module is the TRAINING-time consent gate its output corpus needs
before entering a dataset.

Scale shape: flag extraction is a row-local regex projection (pure
codegen, zero exchange, zero Python); the corpus accounting is ONE
host-keyed hash aggregate with map-side partials.  Both ride whatever
partitioning the corpus already has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# <meta name="robots" content="..."> — both attribute orders, optional
# quotes on the name attr, case-insensitive (same quirk matrix as
# extract.meta_robots, which this module extends with the AI tokens).
_ROBOTS_RE1 = (
    r"""(?i)<meta[^>]*name\s*=\s*["']?robots["']?[^>]*"""
    r"""content\s*=\s*["']([^"']*)["']"""
)
_ROBOTS_RE2 = (
    r"""(?i)<meta[^>]*content\s*=\s*["']([^"']*)["'][^>]*"""
    r"""name\s*=\s*["']?robots["']?"""
)
# <meta name="tdm-reservation" content="..."> — both orders.
_TDM_RE1 = (
    r"""(?i)<meta[^>]*name\s*=\s*["']?tdm-reservation["']?[^>]*"""
    r"""content\s*=\s*["']([^"']*)["']"""
)
_TDM_RE2 = (
    r"""(?i)<meta[^>]*content\s*=\s*["']([^"']*)["'][^>]*"""
    r"""name\s*=\s*["']?tdm-reservation["']?"""
)


def _meta_union(txt: Column, re1: str, re2: str) -> Column:
    return F.concat(
        F.array_join(F.regexp_extract_all(txt, F.lit(re1), 1), " "),
        F.lit(" "),
        F.array_join(F.regexp_extract_all(txt, F.lit(re2), 1), " "),
    )


def ai_optout_flags(
    pages: DataFrame,
    html_col: str = "html",
    header_col: str | None = "x_robots_tag",
) -> DataFrame:
    """Adds ``noai``, ``noimageai``, ``tdm_reserved``, ``ai_opt_out``.

    ``noai``/``noimageai``: token anywhere in the union of all robots
    meta-tag contents and the response-header string.  ``tdm_reserved``:
    any tdm-reservation meta tag with content ``1`` (``0`` waives; the
    LAST tag does not win — any reservation reserves, the conservative
    reading), or a ``tdm-reservation: 1`` header.  ``ai_opt_out`` =
    ``noai OR tdm_reserved`` — the text-training exclusion gate
    (``noimageai`` only excludes the page's IMAGES, not its text).
    """
    txt = F.decode(F.col(html_col), "utf-8")
    hdr = (
        F.coalesce(F.col(header_col), F.lit("")) if header_col
        else F.lit("")
    )
    combined = F.lower(
        F.concat(_meta_union(txt, _ROBOTS_RE1, _ROBOTS_RE2),
                 F.lit(" "), hdr)
    )
    tdm_metas = F.lower(_meta_union(txt, _TDM_RE1, _TDM_RE2))
    tdm = (
        tdm_metas.rlike(r"(^|\s)1(\s|$)")
        | F.lower(hdr).rlike(r"tdm-reservation\s*:\s*1(\s|$|;)")
    )
    noai = combined.rlike(r"\bnoai\b")
    return (
        pages.withColumn("noai", noai)
        .withColumn("noimageai", combined.rlike(r"\bnoimageai\b"))
        .withColumn("tdm_reserved", tdm)
        .withColumn("ai_opt_out", noai | tdm)
    )


def optout_accounting(
    flagged: DataFrame,
    host_col: str = "host",
    tokens_col: str | None = "n_tokens",
) -> DataFrame:
    """Per-host opt-out census over ``ai_optout_flags`` output: page
    and flag counts, ``optout_ppm`` (exact integer ppm), and — when a
    token-count column is present — tokens kept vs lost, the number a
    datasheet reports.  ONE hash aggregate."""
    one = F.lit(1).cast("long")
    b = lambda c: F.col(c).cast("long")  # noqa: E731
    tok = F.col(tokens_col).cast("long") if tokens_col else F.lit(0)
    return (
        flagged.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.sum(one).alias("n_pages"),
            F.sum(b("noai")).alias("n_noai"),
            F.sum(b("noimageai")).alias("n_noimageai"),
            F.sum(b("tdm_reserved")).alias("n_tdm"),
            F.sum(b("ai_opt_out")).alias("n_opt_out"),
            F.sum(F.when(F.col("ai_opt_out"), F.lit(0)).otherwise(tok))
            .alias("tokens_kept"),
            F.sum(F.when(F.col("ai_opt_out"), tok).otherwise(F.lit(0)))
            .alias("tokens_lost"),
        )
        .withColumn(
            "optout_ppm",
            F.expr("n_opt_out * 1000000 div n_pages"),
        )
    )
