"""Soft-404 detection — pages that answer HTTP 200 with an error
template ("sic transit gloria telae", Bar-Yossef et al., WWW 2004).

A focused crawler that trusts status codes indexes every "page not
found" body a misconfigured host serves with 200; the reference's
spiders take status at face value (crawler/spiders/* treat any 200 as
content), so at web scale its corpus silently fills with host error
templates. The classic fix: per host, fetch ONE probe URL that cannot
exist; if the host answers 200, its probe body fingerprint is the
host's soft-404 signature, and any 200 page on that host whose body
fingerprint equals the signature is a soft 404.

Sibling: operators/traps.soft404_flags is the PASSIVE content-side
variant (verbatim-repeat bodies carrying an error phrase) for hosts
the crawler has not probed; this module is the paper's active-probe
form, which needs no phrase list and catches templates in any
language. Both feed the same frontier-admission audit.

Scale shape (10^10 pages, ~10^7 hosts):

  * signatures = one tiny hash agg over the probe rows (<= 1 row per
    host) — broadcastable by construction, the corpus NEVER shuffles:
    the detector is one broadcast left equi-join on host + a row-local
    CASE. (If the host table outgrows broadcast, the join keys on host
    — the same key the politeness/seen planes already bucket by, so it
    co-locates shuffle-free with the frontier layout.)
  * fingerprints are md5 of the body text — computed row-local at
    ingest, no second scan of the bodies.
  * a host whose probe honestly 404s yields no signature; its pages
    pass through unflagged (NULL-safe equality keeps the CASE
    row-local).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def body_fingerprint(text_col) -> F.Column:
    """Row-local body signature: md5 of the whitespace-collapsed,
    lowercased body — tolerant of the per-URL substitutions (dates,
    the echoed URL) hosts inject into otherwise-identical templates is
    handled upstream by template_fps; here the paper's exact-signature
    form is kept so the flag is evidence, not heuristic."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " "))
    )


def host_signatures(probes: DataFrame) -> DataFrame:
    """(host, soft404_fp): fingerprint of the probe body for hosts
    whose probe came back 200 — the soft-404 hosts. Probes that
    honestly 404 produce no row. min() makes accidental duplicate
    probes deterministic."""
    return (
        probes.filter(F.col("status") == 200)
        .groupBy("host")
        .agg(F.min(body_fingerprint(F.col("text"))).alias("soft404_fp"))
    )


def detect_soft404(pages: DataFrame, probes: DataFrame) -> DataFrame:
    """pages + ``is_soft404``: a 200 page whose body fingerprint equals
    its host's probe signature. One broadcast join + row-local CASE;
    input columns (host, url, status, text) pass through."""
    sig = host_signatures(probes)
    fp = body_fingerprint(F.col("text"))
    return (
        pages.join(F.broadcast(sig), "host", "left")
        .withColumn(
            "is_soft404",
            (F.col("status") == 200)
            & F.col("soft404_fp").isNotNull()
            & (fp == F.col("soft404_fp")),
        )
        .drop("soft404_fp")
    )


def soft404_report(flagged: DataFrame) -> DataFrame:
    """Per-host audit: page count, soft-404 count, ppm rate — the
    signal that demotes a host's crawl budget (frontier admission reads
    this the way it reads the trap/politeness audits). One hash agg."""
    return flagged.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col("is_soft404").cast("bigint")).alias("n_soft404"),
        (
            (F.sum(F.col("is_soft404").cast("bigint")) * 1000000)
            / F.count(F.lit(1))
        ).cast("bigint").alias("soft404_ppm"),
    )
