"""Parallel-corpus mining from crawl metadata: hreflang alternate
clusters and CCAligned-style URL matching (El-Kishky, Chaudhary, Guzmán
& Koehn, "CCAligned: A Massive Collection of Cross-Lingual Web-Document
Pairs", EMNLP 2020 §2 — their document alignment mines exactly these
two signals from Common Crawl).

The reference crawler is monolingual-API-focused and has no alignment
plane (its closest analog is the per-source URL canonicalization in
crawler/spiders/helper.py); this module is the multilingual-webtext
extension the 100-TB brief calls for: a training pipeline that wants
translation pairs gets them from the SAME pages table the crawl plane
already maintains.

Tag extraction itself is NOT re-implemented here — that is
``operators/extract.hreflang_map`` (absolute/root-relative resolution,
case-folded lang, binary html), already oracle-paired as
``q_hreflang_map``.  This module takes those edges further:

  * ``hreflang_clusters`` — a cluster is the declaring page plus
    everything it points at, keyed by the lexicographic minimum URL of
    the group (hreflang groups are mutually complete when webmasters
    follow the Google spec, so the local min IS the global min;
    partially-declared groups degrade to per-declarer subclusters —
    CCAligned accepts the same degradation rather than running a
    connected-components pass over 10^10 URLs).
  * ``url_align_pairs`` — most parallel pages never declare hreflang;
    CCAligned's higher-recall signal strips language identifiers from
    the URL (path segment ``/en/``, query param ``lang=en``, subdomain
    ``en.``) and pairs URLs that collide on the stripped key.  The
    pair join is keyed on ``align_key`` whose group size is bounded by
    the language inventory (~100), never an all-pairs corpus join.

Scale shape: clustering is ONE url-keyed hash agg over the edge table;
pairing is ONE equi-join co-keyed on align_key.  No windows, no
Python, no floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language identifiers recognized in URLs; fixture-sized inventory —
# production swaps in the full BCP-47 primary-subtag list (the operator
# logic is inventory-independent)
LANGS = ["en", "de", "fr", "es", "it", "pt", "ja", "zh", "ru", "ar"]


def hreflang_clusters(
    alternates: DataFrame, pages: DataFrame,
    url_col: str = "url", lang_col: str = "lang",
) -> DataFrame:
    """``(cluster_id, url, lang)`` — every page that declares at least
    one alternate, keyed by the lexicographic min of {self} ∪
    {targets}.  ``alternates`` is :func:`operators.extract.hreflang_map`
    output ``(url, lang, target_url)``; ``lang`` in the result comes
    from the PAGE row (the crawl plane's language-ID column), not from
    the self-referential hreflang tag — CCAligned trusts its own LID
    over webmaster declarations for the same reason (§2.1: mislabeled
    hreflang is common)."""
    grouped = (
        alternates.groupBy("url")
        .agg(F.min("target_url").alias("_mt"))
        .select("url", F.least(F.col("_mt"), F.col("url")).alias("cluster_id"))
    )
    lang = pages.select(
        F.col(url_col).alias("url"), F.col(lang_col).alias("lang")
    )
    return grouped.join(lang, "url").select("cluster_id", "url", "lang")


def strip_lang_markers(url: F.Column, langs: list[str] | None = None) -> F.Column:
    """The URL with its language identifiers blanked to ``_`` — path
    segment ``/en/`` (or trailing ``/en``), query param ``lang=en`` /
    ``hl=en``, and subdomain ``en.`` — CCAligned §2.2's alignment key.
    Constant replacement strings only: no backreferences, so the Java
    and RE2 regex dialects (Spark / DuckDB) behave identically."""
    alt = "|".join(langs or LANGS)
    out = F.regexp_replace(url, f"://({alt})\\.", "://_.")
    out = F.regexp_replace(out, f"/({alt})/", "/_/")
    out = F.regexp_replace(out, f"/({alt})$", "/_")
    for sep in ("[?]", "&"):
        for p in ("lang", "hl"):
            out = F.regexp_replace(
                out, f"{sep}{p}=({alt})", f"{sep.strip('[]')}{p}=_"
            )
    return out


def url_lang_guess(url: F.Column, langs: list[str] | None = None) -> F.Column:
    """First language identifier found in the URL (path wins, then
    query param, then subdomain), '' if none."""
    alt = "|".join(langs or LANGS)
    path = F.regexp_extract(url, f"/({alt})(/|$)", 1)
    qp = F.regexp_extract(url, f"[?&](?:lang|hl)=({alt})", 1)
    sub = F.regexp_extract(url, f"://({alt})\\.", 1)
    return F.when(path != "", path).when(qp != "", qp).otherwise(sub)


def url_align_pairs(
    frontier: DataFrame,
    url_col: str = "url",
    pivot_lang: str = "en",
    langs: list[str] | None = None,
) -> DataFrame:
    """``(align_key, src_url, tgt_url, tgt_lang)`` — URL-matching
    document pairs: for every stripped-URL key holding a ``pivot_lang``
    page, one row per other-language page sharing the key.  URLs with
    no language marker never pair (their key would collide across
    unrelated sites' roots).

    The self-join is an equi-join on align_key; per-key fan-out is
    bounded by the language inventory, so no skew salting is needed
    even on 10^10 URLs."""
    u = F.col(url_col)
    keyed = (
        frontier.select(
            u.alias("u"),
            strip_lang_markers(u, langs).alias("align_key"),
            url_lang_guess(u, langs).alias("lg"),
        )
        .filter(F.col("lg") != "")
    )
    src = keyed.filter(F.col("lg") == pivot_lang).select(
        "align_key", F.col("u").alias("src_url")
    )
    tgt = keyed.filter(F.col("lg") != pivot_lang).select(
        "align_key", F.col("u").alias("tgt_url"), F.col("lg").alias("tgt_lang")
    )
    return src.join(tgt, "align_key")
